package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives (SURVEY scale notes: "skewed keys → salting
  * or AQE skew-join"). AQE handles most skew automatically at runtime;
  * these are the explicit tools for the cases it cannot see — e.g. a
  * pre-aggregation whose hot key would overwhelm one reducer, or a join
  * where one side's hot keys are known ahead of time.
  */
object SkewUtils {

  /** Two-phase aggregation for skewed group keys: a deterministic salt
    * splits each hot key across `salts` reducers for the partial phase, a
    * second (tiny) aggregation merges the partials. Works for any
    * decomposable aggregate supplied as (partial, merge) column pairs on
    * matching names.
    *
    * Example:
    * {{{
    * saltedAggregate(df, Seq("k"), 16)(
    *   partial = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *   merge   = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
      saltCols: Seq[String] = Nil)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", contentSalt(df, keys, salts, saltCols))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Deterministic, retry-safe salt: a content hash of the non-key columns
    * (or the caller's `saltCols`). Recomputes identically on stage retry,
    * so a shuffle-fetch failure can't reassign rows across reducers and
    * duplicate/drop them (the SPARK-23207 hazard that
    * monotonically_increasing_id / spark_partition_id salts carry). Caveat:
    * EXACT duplicate rows collapse to one salt — pass a unique id column in
    * `saltCols` for duplicate-heavy inputs.
    */
  private def contentSalt(df: DataFrame, keys: Seq[String], salts: Int,
      saltCols: Seq[String]): Column = {
    val input =
      if (saltCols.nonEmpty) saltCols
      else {
        val nonKey = df.columns.toSeq.diff(keys)
        // hash-of-key would give every row of a hot key the SAME salt — the
        // guard silently does nothing. Refuse rather than degrade silently.
        require(nonKey.nonEmpty,
          s"contentSalt over keys ${keys.mkString(",")}: no non-key columns to " +
            "salt from, so a hot key cannot be spread. Pass saltCols (e.g. a " +
            "unique id column) explicitly.")
        nonKey
      }
    pmod(xxhash64(input.map(col): _*), lit(salts))
  }

  /** Skewed equi-join: replicate the (small) right side `salts` times and
    * salt the left side's key deterministically, so one hot left key fans
    * out over `salts` tasks instead of one. Inner joins only (replication
    * preserves inner-join multiplicity).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int, saltCols: Seq[String] = Nil): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      contentSalt(left, Seq(leftKey), salts, saltCols))
    val replicatedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedLeft.join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          saltedLeft("_salt") === replicatedRight("_salt"))
      .drop("_salt")
  }
}
