package graft

import org.apache.spark.sql.DataFrame

/** Oracle gate for queries whose CANDIDATE GENERATION is not expressible in
  * DuckDB (seeded xxhash64 minhash slots, random-hyperplane signatures) but
  * whose final stage is an exact, oracle-able verification (Jaccard / cosine
  * / Hamming re-score).
  *
  * The pattern (same as [[graft.analytics.HealthcareData]]'s materialized
  * CDC state): in oracle-stage mode the deterministic intermediate — the
  * candidate pair set — is written to a stable absolute path and the query's
  * final stage is rebuilt FROM the materialized copy, so the Spark result
  * provably derives from the exact rows the DuckDB oracle re-verifies via
  * `read_parquet`. The driver's hash gate then checks the whole exact stage
  * (joins, re-scoring arithmetic, threshold, ordering) cross-engine, instead
  * of recording an unchecked `no_oracle` row.
  *
  * Mode is enabled by [[Verify]] (-Dgraft.oracle.stage=1). [[Bench]] leaves
  * it off: the benched plan must include real candidate generation, not a
  * parquet readback — staging in bench would both undermeasure the LSH path
  * and hide its scale behavior.
  */
object OracleStage {

  val Root: String = new java.io.File("target/oracle_stage").getAbsolutePath

  /** DuckDB table expression for a staged intermediate. */
  def pq(name: String): String = s"read_parquet('$Root/$name/*.parquet')"

  def enabled: Boolean = sys.props.get("graft.oracle.stage").contains("1")

  private val written = scala.collection.mutable.Set.empty[String]

  /** Recursively delete the staging root (Verify calls this at startup so a
    * failed staging can never alias a previous run's candidates).
    */
  def clean(): Unit = synchronized {
    written.clear()
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(Root))
  }

  /** In oracle-stage mode: materialize `df` under `name` (once per JVM) and
    * return a scan of the materialized copy. Otherwise: `df` unchanged.
    */
  def stage(name: String, df: DataFrame): DataFrame =
    if (!enabled) df
    else synchronized {
      val dir = s"$Root/$name"
      if (written.add(name)) df.coalesce(1).write.mode("overwrite").parquet(dir)
      df.sparkSession.read.parquet(dir)
    }
}
