package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list, by iterative
  * min-label propagation — the representative-assignment step a near-dup
  * cluster survivor policy needs (one surviving doc per transitive
  * duplicate cluster; see [[graft.pipeline.CorpusPipeline]]).
  *
  * Scale design: every round is one distributed join + partial-aggregating
  * `min` groupBy — no driver-side data, no collect. The driver loop only
  * ITERATES (bounded by `maxIter`), and each round's frame is
  * `localCheckpoint`ed so lineage doesn't grow with the round count.
  * Min-label propagation converges in O(component diameter) rounds;
  * near-dup graphs are unions of small-diameter clusters, so in practice a
  * handful of rounds (star-contraction variants trade implementation
  * complexity for O(log n) worst-case rounds — not needed at dup-cluster
  * diameters). Rounds stop at the first fixpoint (a cheap `count` per
  * round checks convergence).
  */
object ConnectedComponents {

  /** `(id, rep)` for every vertex of `edges`, where `rep` is the MINIMUM
    * vertex id of the vertex's connected component (vertices not in any
    * edge are absent — a caller treats them as their own representative).
    *
    * @param edges two columns, any names: one undirected edge per row
    */
  def minLabel(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    require(edges.columns.length == 2,
      s"edge list must have exactly 2 columns, got ${edges.columns.mkString(",")}")
    val e = edges.toDF("src", "dst")
    val sym = e.union(e.select(col("dst"), col("src"))).toDF("src", "dst")
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("rep"))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbr = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("rep"))
        .groupBy("id").agg(min("rep").as("nbr_rep"))
      val updated = labels.as("l").join(nbr.as("n"), Seq("id"), "left")
        .select(col("id"), col("l.rep").as("old_rep"),
          least(col("l.rep"), coalesce(col("n.nbr_rep"), col("l.rep"))).as("rep"))
        .localCheckpoint()
      changed = updated.filter(col("rep") =!= col("old_rep")).count()
      labels = updated.select("id", "rep")
      i += 1
    }
    require(changed == 0,
      s"connected components did not converge within $maxIter rounds")
    labels
  }
}
