package graft.pipeline

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Probabilistic dedup paths validated against the exact baseline
  * (SparkEntry exposes them rows-only; these are their correctness gate).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(name: String): Set[(Long, Long)] = {
    val df = SparkEntryPairs(name)
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def SparkEntryPairs(name: String) =
    graft.SparkEntry.queries(name)(spark, sf())

  test("MinHash-LSH recovers the exact-Jaccard near-dup pair set") {
    val exact = pairs("q_dedup_ngram_jaccard")
    val lsh = pairs("q_dedup_minhash_lsh")
    // verification step guarantees no false positives; banding with 8×4 at
    // j≥0.8 makes false negatives ~(1-0.8^4)^8 ≈ 0.8% per pair
    assert(lsh.subsetOf(exact), s"LSH produced false positives: ${lsh -- exact}")
    assert(exact.nonEmpty, "test corpus should contain planted near-dups")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low (${lsh.size}/${exact.size})")
  }

  test("incremental dedup: index never re-pairs with itself; precedence is index-first") {
    // near-identical family across the index/incoming split (40 shared
    // tokens, one differing) + an index-only duplicate pair + an
    // incoming-only duplicate pair + unrelated docs
    def doc(tag: String) = ((1 to 40).map(j => s"w$j") :+ tag).mkString(" ")
    val index = Seq(
      (10L, doc("x")), (12L, doc("y")), // index-internal near-dups
      (14L, (1 to 41).map(j => s"i$j").mkString(" "))).toDF("doc_id", "text")
    val incoming = Seq(
      (3L, doc("z")), (5L, doc("q")), // pair with index docs AND each other
      (7L, (1 to 41).map(j => s"n$j").mkString(" "))).toDF("doc_id", "text")
    val got = DedupQueries.nearDupPairsIncremental(index, incoming, minJ = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every emitted pair has an INCOMING victim on the b side...
    assert(got.forall { case (_, b) => b == 3L || b == 5L }, s"non-incoming victim in $got")
    // ...the index-internal near-dup (10, 12) is NOT re-paired...
    assert(!got.contains((10L, 12L)) && !got.contains((12L, 10L)))
    // ...index docs precede incoming even with LARGER ids (a-side = index),
    // and among incoming docs the lower id precedes
    assert(got == Set((10L, 3L), (10L, 5L), (12L, 3L), (12L, 5L), (3L, 5L)), s"got $got")
  }

  test("bucket-skew guard: adversarial hot bucket stays linear, cluster stays connected") {
    // 30% of the corpus is identical boilerplate — every band of every
    // boilerplate doc collides into ONE bucket. Unguarded, that is
    // 150·149/2 ≈ 11k pairs per band; guarded, each hot bucket emits a
    // linear star to the representative.
    val boiler = (1 to 40).map(i => s"boiler$i").mkString(" ")
    val docs = ((1L to 150L).map(i => (i, boiler)) ++
      (151L to 500L).map(i => (i, (1 to 40).map(j => s"u${i}w$j").mkString(" "))))
      .toDF("doc_id", "text")
    val sh = DedupQueries.shinglePostings(docs)
    val hashed = sh.select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val slotAggs = (0 until 32).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    val sig = hashed.groupBy("doc_id").agg(slotAggs.head, slotAggs.tail: _*)
    val bands = sig.select(col("doc_id"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band_id"),
          xxhash64((b * 4 until b * 4 + 4).map(i => col(s"m$i")): _*).as("band_key"))): _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_key"))

    // observability: the hot buckets are visible with their bounded cost
    val stats = LshBlocking.bucketSkewStats(bands, Seq("band_id", "band_key"), "doc_id", 64)
      .collect()
    assert(stats.length == 8, s"expected 8 hot buckets (one per band), got ${stats.length}")
    assert(stats.forall(_.getAs[Long]("bucket_size") == 150L))
    assert(stats.forall(_.getAs[Long]("pairs_guarded") == 149L))

    val cands = LshBlocking.boundedBucketPairs(bands, Seq("band_id", "band_key"), "doc_id", 64)
    // bounded: 8 bands × 149 star edges dedup to 149 distinct pairs, plus
    // whatever the unique docs contribute (none — their buckets are singletons)
    val n = cands.count()
    assert(n <= 500, s"guard failed to bound candidates: $n pairs")
    // connectivity: every boilerplate doc still reaches the representative
    val starEdges = cands.filter(col("id_a") === 1L)
      .collect().map(_.getAs[Long]("id_b")).toSet
    assert(starEdges == (2L to 150L).toSet, "hot-bucket star must connect the whole cluster")
  }

  test("uniform mega-bucket: the absolute backstop fires where the relative guard cannot") {
    import spark.implicits._
    // ONE bucket holds the whole corpus (a colinear blob / exact-duplicate
    // cluster: identical signatures in every band), so mean == bucket size
    // and skewFactor×mean can never be exceeded — only absHot catches it
    val mega = (1L to 3000L).map(i => (0, 0L, i)).toDF("band_id", "band_key", "vec_id")
    val cands = LshBlocking.boundedBucketPairs(mega, Seq("band_id", "band_key"), "vec_id")
    assert(cands.count() == 2999L,
      "mega-bucket did not degrade to the linear star")
    assert(cands.select("id_a").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L),
      "star must center on the bucket minimum")
    // while LARGE-BUT-BELOW-absHot uniform buckets keep exact pair
    // generation (capping those would be the recall bug the relative
    // guard exists to avoid)
    val uniform = (1L to 900L).map(i => (0, i % 3, i)).toDF("band_id", "band_key", "vec_id")
    val exact = LshBlocking.boundedBucketPairs(uniform, Seq("band_id", "band_key"), "vec_id")
    assert(exact.count() == 3L * (300L * 299L / 2L),
      "uniform sub-absHot buckets must stay exact")
  }

  test("salted bucket pairs are EXACT: hot bucket loses nothing, small buckets unchanged") {
    // one hot bucket (13 members, cell = 4 → G = 4 groups / 10 pair-cells),
    // one mid bucket at the cell boundary, singletons, and members sharing
    // several buckets (dedup across buckets must still hold)
    val rows = ((1L to 13L).map(i => (i, "hot")) ++
      (20L to 23L).map(i => (i, "edge")) ++
      Seq((30L, "solo"), (1L, "edge"), (21L, "hot"))).toDF("id", "bucket")
    val plain = rows.as("x").join(rows.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = LshBlocking.saltedBucketPairs(rows, Seq("bucket"), "id", cell = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain,
      s"salted pair set differs: missing=${plain -- salted} extra=${salted -- plain}")

    // inert regime: every bucket ≤ cell → still identical (the default-cell
    // path the gate corpora take)
    val saltedBig = LshBlocking.saltedBucketPairs(rows, Seq("bucket"), "id", cell = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(saltedBig == plain)
  }

  test("df-prune + size-ratio prune preserve the exact near-dup pair set") {
    // naive formulation: plain inverted-index join, no prunes — the pruned
    // production plan must return identical rows (values included)
    val docs = graft.analytics.Tables.documents(spark, sf())
    val sh = DedupQueries.shinglePostings(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val naive = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b", "n_a", "n_b", "n_inter", "jaccard")
      .collect().map(_.toString).sorted
    val pruned = DedupQueries.nearDupPairs(docs, minJ = 0.8)
      .collect().map(_.toString).sorted
    assert(pruned.sameElements(naive))
  }

  test("prefix filtering (PPJoin) is lossless: bit-equal to the inverted-index face") {
    // not just the same pair SET — every column (sizes, intersection,
    // jaccard) must match, since both faces share one oracle
    val full = SparkEntryPairs("q_dedup_ngram_jaccard").collect().toSet
    val pref = SparkEntryPairs("q_dedup_prefix_filter").collect().toSet
    assert(full.nonEmpty, "test corpus should contain planted near-dups")
    assert(pref == full,
      s"prefix face diverged: missing=${full -- pref}, extra=${pref -- full}")
  }

  test("prefix filtering shrinks the pair-join input by ~the theoretical factor") {
    // at minJ=0.8 the prefix keeps n - ceil(0.8 n) + 1 ≈ 0.2·n + 1 of each
    // doc's shingles — the join input must actually shrink accordingly
    // (this is the whole point of the operator; assert ≥3× at our sizes)
    val docs = graft.analytics.Tables.documents(spark, sf())
    val sh = DedupQueries.shinglePostings(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val ranked = sh.join(dfreq, "sh")
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("df", "sh")))
      .join(sizes, "doc_id")
    val prefixCount = ranked
      .filter(col("rk") <= col("n") - ceil(lit(0.8) * col("n")) + 1)
      .count()
    val fullCount = sh.count()
    assert(prefixCount * 3 <= fullCount,
      s"prefix postings $prefixCount vs full $fullCount — filter not effective")
  }

  test("SimHash: hamming distance tracks document similarity") {
    // simhash stability grows with document length; use realistic sizes
    // (one substitution in 60 tokens) rather than 10-token toys
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok30", "tok30x")
    val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val fp = docs.select($"doc_id", simHash64(tokens($"text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val near = ham(fp(1L), fp(2L))
    val far = ham(fp(1L), fp(3L))
    assert(near <= 10, s"near-dup hamming $near")
    assert(far > near + 5, s"unrelated docs not separated: near=$near far=$far")
  }

  test("simhash is order-insensitive enough: identical token bags collide") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha")).toDF("doc_id", "text")
    val fp = docs.select(simHash64(tokens($"text")).as("h"))
      .collect().map(_.getLong(0))
    assert(fp(0) == fp(1))
  }

  test("exploded simhash (scale path) equals the expression-tree simHash64") {
    val docs = graft.analytics.Tables.documents(spark, sf()).select("doc_id", "text").limit(100)
    val hof = docs.select($"doc_id", simHash64(tokens($"text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exploded = DedupQueries.simHashByExplode(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hof == exploded)
  }

  test("winnowing guarantee: docs sharing a long token run share a fingerprint") {
    // k=3 grams, w=4 windows → any shared run of >= k+w-1 = 6 tokens must
    // produce at least one common window minimum
    val shared = "the quick brown fox jumps over"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"unrelated prefix tokens here $shared and a different tail"),
      (3L, "nothing in common with either document at all today")).toDF("doc_id", "text")
    // the PRODUCTION plan (shared helper), not a hand-copied twin
    val fps = TextPipelineQueries.winnowFingerprints(docs)
      .select("doc_id", "fp").distinct()
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared 6-token run must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty, "unrelated docs should not collide")
  }

  test("bag fingerprint detects reordered duplicates that md5 misses") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma alpha beta"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    val out = docs.select(
      md5($"text").as("exact"),
      bagFingerprint(tokens($"text")).as("bag")).collect()
    assert(out(0).getString(0) != out(1).getString(0)) // exact differs
    assert(out(0).getString(1) == out(1).getString(1)) // bag matches
    assert(out(0).getString(1) != out(2).getString(1))
  }

  test("span removal: keeps the corpus-wide first occurrence, rewrites the rest") {
    // doc 1 and doc 2 share the 5-gram "one two three four five"; doc 1
    // (lower doc_id) keeps it, doc 2 loses exactly those 5 token positions.
    // doc 3 shares nothing and survives untouched.
    val dir = java.nio.file.Files.createTempDirectory("graft-spanrm").toString
    Seq(
      (1L, "one two three four five alpha beta", "en", "s", 30L),
      (2L, "prefix one two three four five suffix tail", "en", "s", 40L),
      (3L, "unrelated words only here nothing shared", "en", "s", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("q_dedup_span_removal")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((7L, 0L, "one two three four five alpha beta")))
    assert(out(2L) == ((3L, 5L, "prefix suffix tail")))
    assert(out(3L) == ((6L, 0L, "unrelated words only here nothing shared")))
  }

  test("span removal is partitioning-independent") {
    // argmin-of-struct + integer aggregates are associative/commutative,
    // so the rewrite must be identical however the corpus is split
    val docs = graft.analytics.Tables.documents(spark, sf())
    def run(d: org.apache.spark.sql.DataFrame) =
      DedupQueries.removeDuplicatedSpans(d, 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("incremental span removal: index copies are canonical, batch never rewrites the index") {
    import spark.implicits._
    val index = Seq((10L, "one two three four five kept index tail"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // gram present in the index → removed from the batch even though
      // this is its first occurrence WITHIN the batch
      (1L, "pre one two three four five post"),
      // batch-internal duplicate of a gram the index does NOT have:
      // first batch occurrence survives, second drops
      (3L, "a b c d e mid a b c d e end"))
      .toDF("doc_id", "text")
    val out = DedupQueries.removeDuplicatedSpansIncremental(index, batch, 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 5L, "pre post")))
    assert(out(3L) == ((7L, 5L, "a b c d e mid end")))
    assert(!out.contains(10L), "index documents must not be rewritten")
  }

  test("bloom decontamination: lossless vs the exact face, and actually prunes") {
    // lossless: the bloom face's exact verify join kills every false
    // positive, so the two faces must be value-identical — not just the
    // same doc set
    def rows(name: String) = graft.SparkEntry.queries(name)(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows("q_decontaminate_bloom") == rows("q_decontaminate"))

    // the bit test must do real work: strictly fewer postings reach the
    // verify join than the train stream carries, and never fewer than the
    // true hits (no false negatives by construction)
    val docs = graft.analytics.Tables.documents(spark, sf())
    val sh = DedupQueries.shinglePostings(docs)
    val bench = sh.filter(col("doc_id") % 97 === 0).select("sh").distinct()
    val train = sh.filter(col("doc_id") % 97 =!= 0)
    val words = graft.functions.BloomFilters.build(bench, col("sh"), 16, 2)
    val total = train.count()
    val pruned = train
      .filter(graft.functions.BloomFilters.mightContain(col("sh"), words, 16, 2))
      .count()
    val hits = train.join(bench, "sh").count()
    assert(pruned < total, s"bloom pruned nothing: $pruned of $total")
    assert(pruned >= hits, s"bloom dropped true hits: $pruned < $hits")
  }

  test("bloom filter: zero false negatives over every inserted value") {
    val vals = (0 until 5000).map(i => s"value-$i")
    val df = vals.toDF("v")
    val words = graft.functions.BloomFilters.build(df, col("v"), 14, 2)
    val misses = df
      .filter(!graft.functions.BloomFilters.mightContain(col("v"), words, 14, 2))
      .count()
    assert(misses == 0, s"$misses inserted values missed — bloom is broken")
  }

  test("span removal: within-doc repeats collapse to the first occurrence") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spanrm2").toString
    // the 5-gram "a b c d e" occurs twice INSIDE one doc; second occurrence
    // (positions 5-9) is removed, nothing else
    Seq((1L, "a b c d e a b c d e tail", "en", "s", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.SparkEntry.queries("q_dedup_span_removal")(spark, dir)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getString(3)) ==
      ((6L, 5L, "a b c d e tail")))
  }
}
