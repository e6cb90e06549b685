package graft.operators

import graft.operators.Checkpoints.StableOps
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
    * The size probe IS the collect: one incremental `limit(threshold+1)`
    * job (CollectLimit scans partition ranges until the limit or the end —
    * each upstream partition computed at most once). The r7 shape —
    * `persist()` + full `count()` + `collect()` — materialized the entire
    * pair pipeline into the block manager and then re-read it, and under
    * ambient memory pressure that persist spilled: the driver's r7 bench
    * measured 16.6 s for `q_corpus_clean_cc` where the idle box gives
    * 3.45 s. The common small-graph path now touches the block manager not
    * at all; only the (rare) big-graph fallback persists, because the
    * distributed loop re-reads the edges every round. Trade-off accepted in
    * the fallback: a graph OVER the threshold pays the probe's partial scan
    * twice (CollectLimit stops as soon as threshold+1 rows arrive — cheap
    * for clearly-big graphs, up to ~2× pair generation only in the narrow
    * marginally-over band); persisting before the probe would instead
    * re-impose the full materialization on every SMALL graph, which the
    * driver's r7 bench showed is the regime that actually hurts.
    *
    * `maxIter` bounds the min-label rounds; non-convergence within the
    * bound throws rather than returning wrong labels (min-label needs
    * O(component diameter) rounds). The effective cap grows with the
    * vertex count — `max(maxIter, maxIter + 2·log2(V))` — so a bigger
    * graph buys more rounds before failing, and callers with known long
    * chains (boilerplate-drift paths) raise `maxIter` directly
    * (surfaced as [[graft.pipeline.CorpusPipeline]]'s `ccMaxIter`).
    *
    * @param edges two columns, any names: one undirected edge per row
    */
  def minLabel(edges: DataFrame, maxIter: Int = 25,
      localThreshold: Long = 1000000L): DataFrame = {
    require(edges.columns.length == 2,
      s"edge list must have exactly 2 columns, got ${edges.columns.mkString(",")}")
    require(localThreshold >= 0 && localThreshold < Int.MaxValue,
      s"localThreshold=$localThreshold must fit the limit() probe (< Int.MaxValue)")
    val e = edges.toDF("src", "dst")
    val integral = e.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
    val probe: Option[Array[org.apache.spark.sql.Row]] =
      if (!integral) None
      else {
        val rows = e.select(col("src").cast("long"), col("dst").cast("long"))
          .limit((localThreshold + 1).toInt).collect()
        if (rows.length <= localThreshold) Some(rows) else None
      }
    probe match {
      case Some(rows) =>
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
        rows.foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          // attach the larger root under the smaller: every root stays its
          // component's minimum, so find() IS the min-label representative
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "rep")
      case None =>
        // distributed loop: edges re-read every round — persist HERE only
        val ep = e.persist()
        try {
          val sym = ep.union(ep.select(col("dst"), col("src"))).toDF("src", "dst")
          var labels = sym.select(col("src").as("id")).distinct()
            .select(col("id"), col("id").as("rep"))
          val v = labels.count()
          val cap = math.max(maxIter,
            maxIter + 2 * (64 - java.lang.Long.numberOfLeadingZeros(math.max(v, 1L))))
          var changed = 1L
          var i = 0
          while (changed > 0 && i < cap) {
            val nbr = sym.join(labels, sym("src") === labels("id"))
              .select(col("dst").as("id"), col("rep"))
              .groupBy("id").agg(min("rep").as("nbr_rep"))
            val updated = labels.as("l").join(nbr.as("n"), Seq("id"), "left")
              .select(col("id"), col("l.rep").as("old_rep"),
                least(col("l.rep"), coalesce(col("n.nbr_rep"), col("l.rep"))).as("rep"))
              .stableCheckpoint()
            changed = updated.filter(col("rep") =!= col("old_rep")).count()
            labels = updated.select("id", "rep")
            i += 1
          }
          require(changed == 0,
            s"connected components did not converge within $cap rounds " +
              s"($v vertices; raise maxIter for long-chain graphs)")
          labels
        } finally ep.unpersist()
    }
  }
}
