package graft.pipeline

import graft.SparkSpec
import graft.functions.SkewUtils
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("corpus cleaning drops exact dups, near dups, and low-quality docs") {
    val docs = Seq(
      (1L, "en", (1 to 40).map(i => s"w$i").mkString(" ")),            // clean
      (2L, "en", (1 to 40).map(i => s"w$i").mkString(" ")),            // exact dup of 1
      (3L, "en", ((1 to 39).map(i => s"w$i") :+ "zz").mkString(" ")),  // near dup of 1
      (4L, "en", "short doc"),                                         // fails minTokens
      (5L, "en", (1 to 40).map(i => s"unique$i").mkString(" "))        // clean
    ).toDF("doc_id", "lang", "text").withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text"))

    val survivors = CorpusPipeline.clean(docs)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(survivors == Set(1L, 5L), s"got $survivors")

    val f = CorpusPipeline.funnel(docs).collect()(0)
    assert(f.getAs[Long]("n_input") == 5)
    assert(f.getAs[Long]("n_quality_ok") == 4)
    assert(f.getAs[Long]("n_after_exact") == 3)
    assert(f.getAs[Long]("n_clean") == 2)
  }

  test("near-dup of a quality-rejected doc survives (cluster keeps a representative)") {
    // 10 is a near-dup pair's lower id but FAILS the quality gate (9 tokens);
    // 11 passes quality. Pairs must be computed over quality survivors only,
    // else 11 is dropped as doc_b and the whole cluster vanishes.
    val docs = Seq(
      (10L, "en", (1 to 9).map(i => s"w$i").mkString(" ")),
      (11L, "en", (1 to 10).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val survivors = CorpusPipeline.clean(docs)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(survivors == Set(11L), s"got $survivors")
  }

  test("ConnectedComponents.minLabel finds min-id representatives") {
    val edges = Seq(
      (2L, 1L), (2L, 3L),           // chain component {1,2,3} → rep 1
      (10L, 11L),                   // pair component {10,11} → rep 10
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 20L) // cycle {20..23} → rep 20
    ).toDF("a", "b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L)
    // local union-find fast path (default threshold)
    val local = graft.operators.ConnectedComponents.minLabel(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expected)
    // distributed min-label loop (forced by a zero local threshold)
    val dist = graft.operators.ConnectedComponents.minLabel(edges, localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expected)
  }

  test("survivor policies: transitive chain agrees, hub shape differs") {
    // 30-token docs; 3-gram shingles. doc 3 is the HUB: 1~3 and 2~3 qualify
    // at J≥0.8 (3 tokens changed → 25/31 = 0.806) but 1≁2 (6 tokens apart →
    // 22/34 = 0.647).
    val base = (1 to 30).map(i => s"c$i")
    val hub = Seq(
      (1L, "en", (base.dropRight(3) ++ Seq("x", "y", "z")).mkString(" ")),
      (2L, "en", (Seq("p", "q", "r") ++ base.drop(3)).mkString(" ")),
      (3L, "en", base.mkString(" "))
    ).toDF("doc_id", "lang", "text")
    // Greedy drops only doc_b of qualifying pairs (1,3),(2,3) → {1,2} live
    val greedy = CorpusPipeline.clean(hub)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(greedy == Set(1L, 2L), s"greedy got $greedy")
    // ClusterRepresentative keeps one doc per transitive cluster → {1}
    val ccParams = CorpusPipeline.Params(
      survivorPolicy = CorpusPipeline.ClusterRepresentative)
    val cc = CorpusPipeline.clean(hub, ccParams)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(cc == Set(1L), s"cluster-representative got $cc")

    // transitive chain 1~2, 2~3, 1≁3: both policies keep exactly {1}
    val chain = Seq(
      (1L, "en", base.mkString(" ")),
      (2L, "en", (base.dropRight(3) ++ Seq("x", "y", "z")).mkString(" ")),
      (3L, "en", (Seq("p", "q", "r") ++ base.drop(3).dropRight(3) ++ Seq("x", "y", "z")).mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val chainGreedy = CorpusPipeline.clean(chain)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val chainCc = CorpusPipeline.clean(chain, ccParams)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(chainGreedy == Set(1L), s"chain greedy got $chainGreedy")
    assert(chainCc == Set(1L), s"chain cc got $chainCc")
  }

  test("funnel is monotonically decreasing on the real corpus") {
    val docs = graft.analytics.Tables.documents(spark, sf())
    val f = CorpusPipeline.funnel(docs).collect()(0)
    val (in, q, ex, clean) = (f.getAs[Long]("n_input"), f.getAs[Long]("n_quality_ok"),
      f.getAs[Long]("n_after_exact"), f.getAs[Long]("n_clean"))
    assert(in >= q && q >= ex && ex >= clean)
    assert(clean > 0)
    // the planted near-dups must actually be removed
    assert(clean < ex, "near-dup stage removed nothing on a corpus with planted near-dups")
  }

  test("salted aggregation equals direct aggregation") {
    val df = graft.analytics.Tables.orders(spark, sf())
    val direct = df.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"o_totalprice").cast("decimal(18,2)").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    val salted = SkewUtils.saltedAggregate(df, Seq("o_orderpriority"), salts = 8)(
      partial = Seq(count(lit(1)).as("n"), sum($"o_totalprice".cast("decimal(18,2)")).as("s")),
      merge = Seq(sum($"n").as("n"), sum($"s").cast("decimal(18,2)").as("s")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, (n, s)) =>
      assert(salted(k)._1 == n, s"count for $k")
      assert(salted(k)._2.compareTo(s) == 0, s"sum for $k")
    }
  }

  test("salt is deterministic (content hash, retry-safe) and spreads a hot key") {
    val df = graft.analytics.Tables.orders(spark, sf())
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    // Same rows → same salts on every evaluation (a stage retry recomputes
    // identical values, unlike monotonically_increasing_id salts).
    def saltCounts() = df
      .withColumn("_salt", pmod(xxhash64(col("o_orderkey"), col("o_totalprice")), lit(8)))
      .groupBy("_salt").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(saltCounts() == saltCounts())
    // The aggregate's internal salt must spread the hottest key across
    // multiple partial groups: phase-1 group count > distinct key count.
    val keys = df.select("o_orderpriority").distinct().count()
    val phase1Groups = df
      .withColumn("_salt", pmod(xxhash64(col("o_orderkey"), col("o_totalprice")), lit(8)))
      .select("o_orderpriority", "_salt").distinct().count()
    assert(phase1Groups > keys, s"salt did not spread: $phase1Groups groups for $keys keys")
  }

  test("salted join equals plain inner join") {
    val orders = graft.analytics.Tables.orders(spark, sf()).select("o_orderkey", "o_custkey")
    val customer = graft.analytics.Tables.customer(spark, sf()).select("c_custkey", "c_mktsegment")
    val plain = orders.join(customer, $"o_custkey" === $"c_custkey").count()
    val salted = SkewUtils.saltedJoin(orders, customer, "o_custkey", "c_custkey", salts = 8).count()
    assert(plain == salted)
  }
}
