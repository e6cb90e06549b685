package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** [[QuantileSketch]]'s laws: the column face equals the executor-side
  * JVM face over the whole long range, bucketing is monotone with
  * bounded ids, every value lies inside its bucket's [lo, hi) bounds
  * (the basis of the rank-0/value-≤2^−S error claim), and the sketch
  * state obeys the merge law on BOTH faces — the batch aggregate under
  * any partitioning (partial/merge tree), and the streaming state under
  * any micro-batch chunking (the flatMapGroupsWithState counter merge),
  * each ScalaCheck'd against a single-partition reference.
  */
class QuantileSketchSpec extends SparkSpec {

  private val interesting: Seq[Long] = Seq(
    Long.MinValue, -1L, 0L, 1L, 31L, 32L, 63L, 64L, 65L, 127L, 128L,
    1000L, (1L << 40) - 1, 1L << 40, Long.MaxValue - 1, Long.MaxValue)

  test("column face == JVM face, bounds contain the value, ids bounded") {
    import spark.implicits._
    val gen = Gen.oneOf(Gen.oneOf(interesting), Gen.choose(0L, Long.MaxValue),
      Gen.choose(0L, 100000L))
    val prop = Prop.forAllNoShrink(Gen.nonEmptyListOf(gen)) { vs =>
      val rows = vs.toDF("v").select(col("v"),
          QuantileSketch.bucketOf(col("v")).as("id"),
          QuantileSketch.bucketLo(QuantileSketch.bucketOf(col("v"))).as("lo"),
          QuantileSketch.bucketHi(QuantileSketch.bucketOf(col("v"))).as("hi"))
        .collect()
      rows.forall { r =>
        val (v, id, lo, hi) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        id == QuantileSketch.bucketOfJvm(v) &&
          id >= 0 && id < QuantileSketch.NumBuckets &&
          (v <= 0 || (lo <= v && v <= hi)) && // hi is INCLUSIVE (top = MaxValue)
          (id >= 64 || hi == lo) &&
          (id < 64 || (hi - lo + 1) * 32 <= lo) // relative width ≤ 2^−5
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("bucket id is monotone in the value") {
    import spark.implicits._
    val vs = (interesting.filter(_ >= 0) ++ (0L to 4096L)).distinct.sorted
    val ids = vs.toDF("v").select(QuantileSketch.bucketOf(col("v")))
      .collect().map(_.getLong(0))
    assert(ids.zip(ids.tail).forall { case (a, b) => a <= b })
  }

  test("merge law, batch face: any split/order of the input yields the same counters") {
    import spark.implicits._
    val gen = for {
      vs <- Gen.nonEmptyListOf(Gen.choose(0L, 1L << 50))
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (vs, seed)
    val prop = Prop.forAllNoShrink(gen) { case (vs, seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(vs)
      def counters(xs: List[Long], parts: Int): Map[(Long, Int), Long] = {
        val ds = xs.map(v => graft.streaming.StreamOps.QsIn(v % 3, v)).toDS()
          .repartition(parts) // different partial split/merge trees
        graft.streaming.StreamOps.dailyQuantileSketch(ds)
          .collect().map(c => ((c.day_num, c.bucket), c.cnt)).toMap
      }
      counters(vs, 1) == counters(shuffled, 4)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("merge law, streaming face: any micro-batch chunking yields the batch counters") {
    // the actual flatMapGroupsWithState counter-merge path: values arrive
    // through a MemoryStream in ScalaCheck-varied chunkings/orders, and
    // the final state snapshot must equal the batch face over the whole
    // input — the batch-face test above can't see this path (a toDS()
    // input takes the batch groupBy branch)
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val gen = for {
      vs <- Gen.nonEmptyListOf(Gen.choose(0L, 1L << 50))
      seed <- Gen.choose(0L, Long.MaxValue)
      nChunks <- Gen.choose(1, 5)
    } yield (vs, seed, nChunks)
    var trial = 0
    val prop = Prop.forAllNoShrink(gen) { case (vs, seed, nChunks) =>
      trial += 1
      val qn = s"qs_mergelaw_$trial"
      val shuffled = new scala.util.Random(seed).shuffle(vs)
        .map(v => StreamOps.QsIn(v % 3, v))
      val chunkSize = math.max(1, (shuffled.size + nChunks - 1) / nChunks)
      val input = MemoryStream[StreamOps.QsIn]
      val query = StreamOps.dailyQuantileSketch(input.toDS())
        .writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Update()).start()
      val streamed =
        try {
          shuffled.grouped(chunkSize).foreach { c =>
            input.addData(c); query.processAllAvailable()
          }
          // latest snapshot per cell: n_seen grows strictly within a day,
          // so the freshest update of each (day, bucket) has the max
          spark.table(qn)
            .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("day_num", "bucket")
                .orderBy(col("n_seen").desc)))
            .filter(col("rk") === 1)
            .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
        } finally {
          query.stop()
          spark.catalog.dropTempView(qn)
        }
      val batch = StreamOps.dailyQuantileSketch(
          vs.map(v => StreamOps.QsIn(v % 3, v)).toDS())
        .collect().map(c => ((c.day_num, c.bucket), c.cnt)).toMap
      streamed == batch
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
