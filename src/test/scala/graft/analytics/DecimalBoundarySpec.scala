package graft.analytics

import graft.SparkSpec

/** Retirement home of the round-8 diagnostic canary `hc_dailyrev_probe_minmax_raw`
  * (previously registered in `HealthcareEntry.queries`).
  *
  * History: `hc_daily_revenue` hash-mismatched the DuckDB oracle for five
  * consecutive rounds while every row/schema gate passed. Round 8's probe
  * family localized the cause: the correctness driver reads the Spark parquet
  * output with pyarrow and the oracle result with DuckDB, and the two
  * normalize DECIMAL values differently (scale/trailing-zero representation),
  * so a raw DECIMAL output column hash-diverges even when the values are
  * numerically identical. Four integer-cents probes ran green while the
  * deliberately-raw min/max probe ran red — confirming the boundary rule:
  * **driver-visible output columns are BIGINT/DOUBLE/DATE/STRING/BOOLEAN
  * only; DECIMAL never crosses the boundary raw.**
  *
  * This spec keeps the diagnostic alive without a permanently-red row in the
  * correctness artifact: it asserts the raw DECIMAL min/max values are
  * value-identical (×100) to the green BIGINT-cents probe — i.e. the five red
  * rounds were reader normalization, never wrong data.
  */
class DecimalBoundarySpec extends SparkSpec {

  private val Now = HealthcareData.Now

  test("raw DECIMAL min/max probe is value-identical to the green cents probe") {
    val t = HealthcareData.tables(spark)

    val raw = HealthcareQueries.dailyRevenueProbeMinMaxRaw(t, Now)
      .selectExpr(
        "visit_date",
        "CAST(CAST(min_charge AS DECIMAL(18,2)) * 100 AS BIGINT) AS min_cents",
        "CAST(CAST(max_charge AS DECIMAL(18,2)) * 100 AS BIGINT) AS max_cents")

    val cents = HealthcareQueries.dailyRevenueProbeMinMaxCents(t, Now)
      .select("visit_date", "min_cents", "max_cents")

    assert(raw.count() > 0, "probe window must be non-empty for the check to mean anything")
    assert(raw.except(cents).isEmpty && cents.except(raw).isEmpty,
      "raw-DECIMAL min/max must equal the integer-cents probe row-for-row; " +
        "any divergence here is a REAL regression, not reader normalization")
  }

  test("raw probe emits DECIMAL columns — the type the boundary rule bans") {
    val t = HealthcareData.tables(spark)
    val schema = HealthcareQueries.dailyRevenueProbeMinMaxRaw(t, Now).schema
    val moneyTypes = schema.filter(f => Set("min_charge", "max_charge")(f.name)).map(_.dataType.typeName)
    assert(moneyTypes.forall(_.startsWith("decimal")),
      s"probe intentionally emits raw DECIMAL (got $moneyTypes) — it exists to document why that is banned at the driver boundary")
  }
}
