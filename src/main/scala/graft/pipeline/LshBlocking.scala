package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew guard for LSH-style bucket self-joins (MinHash bands, SimHash
  * chunks, random-projection bands).
  *
  * An unguarded self-join on bucket keys is quadratic PER BUCKET: one hot
  * bucket of B members (empty docs, boilerplate, zero vectors — at 100 TB a
  * single band bucket easily collects 10⁶ docs) lands B² candidate pairs on
  * one reducer and kills the stage. The guard bounds every bucket's output:
  *
  *  - buckets with ≤ `maxBucket` members keep exact all-pairs generation
  *    (≤ maxBucket² pairs, and real buckets are far smaller);
  *  - hot buckets degrade to a STAR: every member pairs only with the
  *    bucket's minimum id (B−1 pairs, linear). For the content that creates
  *    hot buckets — exact/near-identical members — the star preserves
  *    cluster connectivity (every member still reaches the representative,
  *    and downstream exact verification confirms each edge), so dedup via
  *    connected components loses nothing. What CAN be lost are pairs of
  *    dissimilar members that merely collided in the hot bucket — pairs that
  *    other, less-skewed bands still catch (the standard b-bands recall
  *    argument), and that exact verification would mostly reject anyway.
  *
  * The bucket sizes come from a WINDOW over the bucket key, so the guard and
  * the self-join hang off ONE exchange of the banded rows (see tagHot) — the
  * guard costs a per-partition sort, not a recompute of the banding's
  * upstream.
  */
object LshBlocking {

  /** A bucket counts as HOT when its size exceeds
    * max(minHot, min(absHot, skewFactor × mean bucket size)): skew is
    * FIRST an outlier relative to the banding's typical bucket, not a
    * fixed count — coarse bandings (few bits per band) legitimately
    * produce large-but-uniform buckets, and capping those at a small
    * fixed size would be a recall bug whose real fix is more bits per
    * band, chosen by the caller. But the relative test alone has a blind
    * spot the round-16 skew probe measured: a corpus with one massive
    * (near-)identical cluster — exact-duplicate boilerplate at crawl
    * scale, or a colinear embedding blob — puts ~ALL rows into ONE bucket
    * per band, so the mean IS the hot bucket and skewFactor×mean can
    * never be exceeded (20k colinear vectors = 6B candidate pairs,
    * 18+ min where the guarded path takes seconds). No bit count splits
    * identical signatures, so "more bits" cannot fix that case either.
    * `absHot` is the absolute backstop: any bucket beyond it degrades to
    * the star regardless of the mean. The default (1024 = 8× the
    * adaptive banding's ~128 target population, mirroring skewFactor)
    * sits far above every healthy bucket the probes have measured and
    * caps the per-bucket pair work at ~absHot²/2.
    *
    * Shaped as a WINDOW over the bucket key, not aggregate-then-join-back:
    * an aggregate's exchange (partial-agg rows) and the join's exchange (raw
    * rows) are different subtrees, so the agg+join form recomputes `banded`'s
    * whole upstream — for MinHash that is the full signature pipeline —
    * twice. The window tags sizes in ONE pass over one exchange, and every
    * downstream consumer (both self-join sides, the hot-star branch, the
    * mean) hangs off that same exchange, which ReuseExchange then dedupes.
    * The 1-row mean broadcast-cross-joins on top — a nested-loop join with a
    * PROVABLY single-row build side is O(n), and PlanAuditSpec's unkeyed-join
    * audit admits exactly that case (a constant equi-key doesn't survive the
    * optimizer: FoldablePropagation folds `1 = 1` away and the plan
    * degenerates to the same cross join).
    */
  private def tagHot(banded: DataFrame, keyCols: Seq[String], idCol: String,
      minHot: Int, skewFactor: Double, absHot: Int): DataFrame = {
    require(minHot >= 2, s"minHot=$minHot: need ≥ 2 for any pair to survive")
    require(skewFactor > 1.0, s"skewFactor=$skewFactor: must exceed 1 (mean bucket is not hot)")
    require(absHot >= minHot, s"absHot=$absHot below minHot=$minHot")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
    val sized = banded
      .withColumn("_bsz", count(lit(1)).over(w))
      .withColumn("_rep", min(col(idCol)).over(w))
    val meanSize = sized
      .select(keyCols.map(col) :+ col("_bsz"): _*).distinct()
      .agg(avg(col("_bsz")).as("_mean"))
    sized.crossJoin(broadcast(meanSize))
      .withColumn("_hot",
        col("_bsz") > greatest(lit(minHot.toLong),
          least(lit(absHot.toLong), lit(skewFactor) * col("_mean"))))
      .drop("_mean")
  }

  /** Candidate id pairs (id_a < id_b) from bucket collisions, with per-bucket
    * output bounded as described above. `keyCols` identify the bucket (e.g.
    * band_id, band_key); `idCol` is the member id. Emits BARE id pairs —
    * callers rejoin payloads (vectors, fingerprints) after the distinct, so
    * the skewed join never shuffles wide rows.
    */
  def boundedBucketPairs(banded: DataFrame, keyCols: Seq[String], idCol: String,
      minHot: Int = 64, skewFactor: Double = 8.0, absHot: Int = 1024): DataFrame = {
    val tagged = tagHot(banded, keyCols, idCol, minHot, skewFactor, absHot)
    val small = tagged.filter(!col("_hot"))
    val joinCond: Column = keyCols.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
      col(s"x.$idCol") < col(s"y.$idCol")
    val smallPairs = small.as("x").join(small.as("y"), joinCond)
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
    // star: _rep = min(id) over the bucket, so _rep < idCol always holds
    val hotPairs = tagged
      .filter(col("_hot") && col(idCol) =!= col("_rep"))
      .select(col("_rep").as("id_a"), col(idCol).as("id_b"))
    smallPairs.union(hotPairs).distinct()
  }

  /** EXACT all-pairs bucket self-join with per-reducer work bounded by
    * `cell`²: each bucket's members are row_number-partitioned into groups
    * of `cell`, and pair-cell (p ≤ q) joins group p against group q, so a
    * hot bucket of B members spreads its B²/2 pairs across G² ≈ (B/cell)²
    * reducer cells of ≤ cell² work each instead of landing them on ONE
    * reducer. Replication cost is G rows per member per side — linear
    * until a bucket actually exceeds `cell`, and for buckets with ≤ cell
    * members G = 1, where the plan degenerates to the plain self-join:
    * the guard is INERT until skew appears (DedupSpec asserts output
    * identity on both regimes).
    *
    * Unlike [[boundedBucketPairs]] this NEVER drops a candidate — use it
    * where the blocking's recall contract is exactness and every collision
    * must be verified (the FastSS deletion-variant index: a name-frequency
    * hot spot must not flatten to a star, because no other band exists to
    * recover the lost pairs and the lev-≤1 promise is FULL recall).
    * The quadratic pair count itself is irreducible (those pairs exist);
    * what the salt fixes is WHERE they are computed.
    */
  def saltedBucketPairs(banded: DataFrame, keyCols: Seq[String], idCol: String,
      cell: Int = 256): DataFrame = {
    require(cell >= 2, s"cell=$cell: need ≥ 2 members per group")
    val keys = keyCols.map(col)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col(idCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
    // r18: BOTH pair-join sides (aSide/bSide) consume this frame — without
    // a pin, each side re-runs the whole upstream (variant derivation +
    // the two windows); exchange reuse only dedupes the exchange, not the
    // window/explode above it. Eager checkpoint = one computation.
    import graft.operators.Checkpoints.StableOps
    val grouped = banded
      .withColumn("_idx", row_number().over(wOrd) - 1)
      .withColumn("_bsz", count(lit(1)).over(wAll))
      .withColumn("_g", floor(col("_idx") / cell))
      .withColumn("_gmax", floor((col("_bsz") - 1) / cell))
      .stableCheckpoint()
    // member of group g participates in cells (g, q) for q ≥ g as the
    // A-side and (p, g) for p ≤ g as the B-side — every pair (x, y) with
    // gx ≤ gy meets in exactly cell (gx, gy)
    val aSide = grouped.withColumn("_q", explode(expr("sequence(_g, _gmax)")))
      .select(keys :+ col(idCol).as("_ida") :+ col("_g").as("_p") :+ col("_q"): _*)
    val bSide = grouped.withColumn("_p", explode(expr("sequence(0, _g)")))
      .select(keys :+ col(idCol).as("_idb") :+ col("_p") :+ col("_g").as("_q"): _*)
    val joinCond = (keyCols.map(k => col(s"x.$k") === col(s"y.$k")) ++
      Seq(col("x._p") === col("y._p"), col("x._q") === col("y._q"))).reduce(_ && _)
    aSide.as("x").join(bSide.as("y"), joinCond)
      .filter(col("x._ida") =!= col("y._idb"))
      .select(least(col("x._ida"), col("y._idb")).as("id_a"),
        greatest(col("x._ida"), col("y._idb")).as("id_b"))
      .distinct()
  }

  /** Hot buckets with their sizes and bounded-vs-unguarded pair costs — the
    * observability companion to [[boundedBucketPairs]] (same threshold
    * logic). Run it when you want skew stats logged/persisted; it is not
    * computed eagerly on the query path (that would force an extra job per
    * query).
    */
  def bucketSkewStats(banded: DataFrame, keyCols: Seq[String], idCol: String,
      minHot: Int = 64, skewFactor: Double = 8.0, absHot: Int = 1024): DataFrame =
    tagHot(banded, keyCols, idCol, minHot, skewFactor, absHot)
      .filter(col("_hot"))
      .select(keyCols.map(col) :+ col("_bsz").as("bucket_size"): _*)
      .distinct() // tagHot tags members; stats report one row per bucket
      .withColumn("pairs_unguarded", col("bucket_size") * (col("bucket_size") - 1) / 2)
      .withColumn("pairs_guarded", col("bucket_size") - 1)
}
