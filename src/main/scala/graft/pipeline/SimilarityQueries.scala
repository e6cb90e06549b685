package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`array<float>`, 64-dim, 10 cluster labels).
  *
  *  - `q_cosine_brute` / `q_ann_cosine_topk`: exact brute-force cosine — the
  *    correctness baseline. The query vector is broadcast (a one-row cross
  *    join), scoring is a map-only codegen'd expression, top-k plans as
  *    TakeOrderedAndProject — so even "brute force" is one pass, no shuffle.
  *  - `q_ann_ivf_topk`: the scale path — IVF with the label column as the
  *    partition assignment: score 10 centroids, probe the best 2 partitions,
  *    search only those. At 100 TB the probe prunes ~80 % of the corpus
  *    before any row is scored; centroids are a broadcast-size side table.
  */
object SimilarityQueries {

  /** DuckDB oracle expression for cosine between `embedding` and a query
    * vector column `q`, computed float→double elementwise, sequential sum —
    * mirrors VectorFunctions.cosine bit-for-bit (then rounded to 9 dp to
    * absorb any summation-order ulp).
    */
  private def cosSql(a: String, b: String) =
    s"""(list_sum(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |   * sqrt(list_sum(list_transform(generate_series(1, len($b)), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))))""".stripMargin.replace("\n", " ")

  val defs: Seq[QueryDef] = Seq(

    // ----- Brute-force cosine scoring against a fixed query vector -----
    QueryDef(
      "q_cosine_brute",
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label,
         |       ROUND(${cosSql("e.embedding", "qv")}, 9) AS cosine
         |FROM embeddings e, q
         |WHERE e.vec_id <= 100
         |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.filter(col("vec_id") <= 100)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(cosine(col("embedding"), col("qv")), 9).as("cosine"))
        .orderBy("vec_id")
    },

    // ----- Exact top-k neighbors (TakeOrderedAndProject, one pass) -----
    QueryDef(
      "q_ann_cosine_topk",
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label,
         |       ROUND(${cosSql("e.embedding", "qv")}, 9) AS cosine
         |FROM embeddings e, q
         |WHERE e.vec_id <> 0
         |ORDER BY cosine DESC, vec_id
         |LIMIT 10""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(cosine(col("embedding"), col("qv")), 9).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(10)
    },

    // ----- IVF-style partitioned ANN: probe best partitions only -----
    // Probabilistic recall (depends on partition quality) → rows-only here;
    // SimilaritySpec measures recall@10 against the brute-force baseline.
    QueryDef.rowsOnly("q_ann_ivf_topk") { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      // centroid per label: elementwise mean — 10 rows, broadcastable
      val dim = 64
      val centroids = e.groupBy("label")
        .agg(sumVectors(col("embedding"), dim).as("sumv"), count(lit(1)).as("n"))
        .select(col("label"),
          transform(col("sumv"), x => x / col("n")).as("centroid"))
      // probe: top-2 centroids by cosine to the query
      val probed = centroids.crossJoin(broadcast(q))
        .select(col("label"), cosine(col("centroid"), col("qv")).as("cscore"))
        .orderBy(col("cscore").desc, col("label"))
        .limit(2)
        .select(col("label"))
      // search only the probed partitions (join prunes before scoring)
      e.filter(col("vec_id") =!= 0)
        .join(broadcast(probed), "label")
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(cosine(col("embedding"), col("qv")), 9).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(10)
    }
  )
}
