package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark DataFrame builder over the testdata
  * directory plus (optionally) an equivalent DuckDB SQL oracle.
  *
  * Column names MUST match between `build` output and `oracle` — the driver
  * sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))

  def rowsOnly(name: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
