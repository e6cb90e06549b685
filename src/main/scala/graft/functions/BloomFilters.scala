package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal integer Bloom filter built and probed with codegen'd Column
  * expressions only — no UDF, no driver-side hashing of data rows.
  *
  * Build: each value contributes k probe positions (`xxhash64(j, v) mod m`);
  * positions fold into m/64 BIGINT words via a distributed `bit_or`
  * aggregate. The collect is bounded by CONSTRUCTION, not by data: exactly
  * m/64 rows (logM is a compile-time constant of the calling operator), the
  * same justification as the connected-components probe collect. At 100 TB
  * the build is one aggregate over the SMALL side (a benchmark set, a
  * blocklist) and the result ships to executors inside the probe
  * expression's literal — Spark's own runtime bloom join (InjectRuntimeFilter)
  * uses exactly this aggregate→literal shape.
  *
  * Probe: a pure map-side bit test — `get(words, pos>>6) & (1<<(pos&63))`
  * — so the BIG side is filtered before any join/exchange. False positives
  * are possible (callers must re-verify exactly); false negatives are not:
  * the probe recomputes the same xxhash64 probes the build folded in.
  */
object BloomFilters {

  /** Fold the distinct values of `c` in `df` into an (1<<logM)-bit filter,
    * returned as its (1<<logM)/64 words. Runs one Spark job.
    */
  def build(df: DataFrame, c: Column, logM: Int, k: Int): Array[Long] = {
    require(logM >= 6 && logM <= 30, s"logM=$logM out of range")
    val m = 1L << logM
    val probes = (0 until k).map(j => pmod(xxhash64(lit(j), c), lit(m)))
    val words = df
      .select(explode(array(probes: _*)).as("pos"))
      .select(
        shiftright(col("pos"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L),
          col("pos").bitwiseAND(lit(63L)).cast("int")).as("mask"))
      .groupBy("w")
      .agg(call_function("bit_or", col("mask")).as("bits"))
      .collect() // bounded: ≤ m/64 rows by construction (see Scaladoc)
    val arr = new Array[Long]((m / 64).toInt)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership test for `c` against a filter built with the same
    * (logM, k). Pure projection/bit ops — stays inside whole-stage codegen
    * and pushes below joins as an ordinary Filter.
    */
  def mightContain(c: Column, words: Array[Long], logM: Int, k: Int): Column = {
    val m = 1L << logM
    val arr = typedLit(words.toSeq)
    (0 until k)
      .map { j =>
        val pos = pmod(xxhash64(lit(j), c), lit(m))
        val word = get(arr, shiftright(pos, 6).cast("int"))
        val mask = call_function("shiftleft", lit(1L),
          pos.bitwiseAND(lit(63L)).cast("int"))
        word.bitwiseAND(mask) =!= lit(0L)
      }
      .reduce(_ && _)
  }
}
