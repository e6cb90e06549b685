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
    * Small edge sets (≤ `localThreshold` edges, a BOUNDED collect of a few
    * MB — near-dup pair graphs after blocking are far below it even when
    * the corpus is huge) are solved exactly on the driver with union-find:
    * O(E·α) in one job, instead of O(diameter) distributed rounds each
    * paying join + checkpoint + convergence-count job overhead. Larger
    * graphs take the distributed min-label loop.
    *
    * @param edges two columns, any names: one undirected edge per row
    */
  def minLabel(edges: DataFrame, maxIter: Int = 25,
      localThreshold: Long = 1000000L): DataFrame = {
    require(edges.columns.length == 2,
      s"edge list must have exactly 2 columns, got ${edges.columns.mkString(",")}")
    // the edge frame is consumed at least twice (size probe + solve; the
    // distributed loop reuses it every round) and is typically the OUTPUT
    // of an expensive pair generation — persist it for the method's scope
    val e = edges.toDF("src", "dst").persist()
    try {
      val integral = e.schema.fields.forall(f =>
        f.dataType == org.apache.spark.sql.types.LongType ||
          f.dataType == org.apache.spark.sql.types.IntegerType)
      if (integral && e.count() <= localThreshold) {
        val spark = e.sparkSession
        import spark.implicits._
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x // path compression
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        e.select(col("src").cast("long"), col("dst").cast("long")).collect().foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          // attach the larger root under the smaller: every root stays its
          // component's minimum, so find() IS the min-label representative
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "rep")
      } else {
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
    } finally e.unpersist()
  }
}
