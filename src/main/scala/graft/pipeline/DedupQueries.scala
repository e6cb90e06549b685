package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over `documents` (SURVEY: training-data pipeline
  * operators). Three strategies, all shared-nothing:
  *
  *  1. exact n-gram Jaccard via an INVERTED-INDEX join — explode distinct
  *     shingles, self-join on the shingle, count per pair = |A∩B|. No O(n²)
  *     cross join ever materializes; the shuffle key is the shingle, so the
  *     plan scales with total postings, not documents².
  *  2. MinHash + LSH banding — constant-size signature per doc (k=32 hashes,
  *     8 bands × 4 rows), candidates = band-bucket collisions, then exact
  *     Jaccard verification of the (tiny) candidate set. This is the 100 TB
  *     path: signature build is map-only, the only shuffle groups ~8 band
  *     keys per doc.
  *  3. SimHash — one 64-bit fingerprint per doc; near-dup iff Hamming ≤ r.
  *     Candidate generation via 4×16-bit chunk blocking (pigeonhole: any pair
  *     with Hamming ≤ 3 shares at least one exact chunk).
  */
object DedupQueries {

  private val toksSql =
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)"

  /** doc_id → distinct 3-word shingles. */
  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), wordShingles(tokens(col("text")), 3).as("shingles"))

  /** Exact-Jaccard pair verification given candidate (doc_a, doc_b) pairs. */
  private def verifyPairs(cands: DataFrame, sh: DataFrame, minJaccard: Double): DataFrame = {
    val sa = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"),
      size(col("shingles")).as("n_a"))
    val sb = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"),
      size(col("shingles")).as("n_b"))
    cands.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "n_a", "n_b", "n_inter", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val defs: Seq[QueryDef] = Seq(

    // ----- Exact n-gram Jaccard near-dup pairs (inverted-index join) -----
    QueryDef(
      "q_dedup_ngram_jaccard",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |              CASE WHEN len(toks) >= 3
         |                   THEN list_distinct(list_transform(generate_series(1, len(toks)-2),
         |                                      i -> array_to_string(toks[i:i+2], ' ')))
         |                   ELSE [] END AS shingles
         |       FROM t),
         |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         |          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b, n_inter,
         |       CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
         |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val sh = shingled(s, d)
      val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n"))
      val pairs = ex.as("a").join(ex.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      pairs
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
        .withColumn("jaccard",
          col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
        .filter(col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "n_a", "n_b", "n_inter", "jaccard")
        .orderBy("doc_a", "doc_b")
    },

    // ----- MinHash + LSH banding, exact-verified (the at-scale dedup path) -----
    // Probabilistic candidate generation → no oracle; DedupSpec asserts it
    // recovers the exact-Jaccard pair set on the test corpus.
    QueryDef.rowsOnly("q_dedup_minhash_lsh") { (s, d) =>
      val sh = shingled(s, d).filter(size(col("shingles")) > 0)
      val banded = sh
        .select(col("doc_id"),
          explode(lshBandKeys(minHashSignature(col("shingles"), k = 32), bands = 8, rowsPerBand = 4))
            .as("band"))
        .select(col("doc_id"), col("band.band_id"), col("band.band_key"))
      // candidates: same (band_id, band_key) bucket — the ONLY shuffle over docs
      val cands = banded.as("x").join(banded.as("y"),
          col("x.band_id") === col("y.band_id") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      verifyPairs(cands, sh, minJaccard = 0.8)
    },

    // ----- SimHash fingerprints + Hamming-blocked near-dup pairs -----
    QueryDef.rowsOnly("q_dedup_simhash") { (s, d) =>
      val fp = Tables.documents(s, d)
        .select(col("doc_id"), simHash64(tokens(col("text"))).as("simhash"))
      // 4 chunks of 16 bits; Hamming ≤ 3 ⇒ some chunk matches exactly
      val chunks = fp.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("chunk_id"),
            shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL).as("chunk"))): _*)).as("c"))
        .select(col("doc_id"), col("simhash"), col("c.chunk_id"), col("c.chunk"))
      chunks.as("x").join(chunks.as("y"),
          col("x.chunk_id") === col("y.chunk_id") &&
            col("x.chunk") === col("y.chunk") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.simhash").as("sim_a"), col("y.simhash").as("sim_b"))
        .distinct()
        .withColumn("hamming", hamming64(col("sim_a"), col("sim_b")))
        .filter(col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    }
  )
}
