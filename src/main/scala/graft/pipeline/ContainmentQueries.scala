package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.TextFunctions.toksSql
import org.apache.spark.sql.functions._

/** Containment dedup — the ASYMMETRIC overlap face Jaccard cannot see: a
  * short document quoted verbatim inside a long one scores
  * |A∩B|/|A∪B| ≈ |A|/|B| (far below any dup threshold) but
  * C(A→B) = |A∩B|/|A| ≈ 1. Quote/subset detection is the standard
  * containment use (and the reason decontamination pipelines check
  * containment of the BENCHMARK side, not Jaccard). This corpus has no
  * organic quote structure — every organic containment-0.9 pair is also
  * a Jaccard dup — so the fixture PLANTS it: every 83rd document
  * re-appears concatenated with its successor as a composite
  * (doc_id + 2·10⁶), giving true contained-in-composite rows whose
  * Jaccard sits near |A|/|B| (the emitted jaccard column shows exactly
  * the asymmetry).
  *
  * Scale shape: identical to q_dedup_ngram_jaccard's inverted-index
  * contract — distinct 3-word shingle postings, shingle-keyed pair join
  * (df-bounded), per-pair counts, sizes joined back; the directional
  * union is a projection, not a second join pass.
  */
object ContainmentQueries {

  private val ContTau = 0.9
  private val CompEvery = 83
  // Composite (planted) doc ids must NEVER collide with organic ids — a
  // fixed 2·10⁶ offset would silently merge a planted composite with a
  // real document on any corpus with ≥ 2M docs (r16 advice). Both engines
  // derive the offset from the corpus itself: the next multiple of 1000
  // above max(doc_id).
  private val CompBaseSql = "(SELECT (max(doc_id) // 1000 + 1) * 1000 FROM documents)"

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_dedup_containment",
      s"""WITH docs2 AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT a.doc_id + $CompBaseSql AS doc_id, a.text || ' ' || b.text AS text
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
         |  WHERE a.doc_id % $CompEvery = 0),
         |t AS (SELECT doc_id, $toksSql AS toks FROM docs2),
         |sh AS (SELECT doc_id,
         |              CASE WHEN len(toks) >= 3
         |                   THEN list_distinct(list_transform(generate_series(1, len(toks)-2),
         |                                      i -> array_to_string(toks[i:i+2], ' ')))
         |                   ELSE [] END AS shingles
         |       FROM t),
         |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_inter
         |          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |sized AS (SELECT da, db, sa.n AS n_a, sb.n AS n_b, n_inter
         |          FROM pairs JOIN sizes sa ON da = sa.doc_id
         |                     JOIN sizes sb ON db = sb.doc_id),
         |d AS (SELECT da AS contained_id, db AS container_id,
         |             n_a AS n_contained, n_b AS n_container, n_inter FROM sized
         |      UNION ALL
         |      SELECT db, da, n_b, n_a, n_inter FROM sized)
         |SELECT contained_id, container_id,
         |       CAST(n_contained AS BIGINT) AS n_contained,
         |       CAST(n_container AS BIGINT) AS n_container,
         |       CAST(n_inter AS BIGINT) AS n_inter,
         |       CAST(n_inter AS DOUBLE) / n_contained AS containment,
         |       CAST(n_inter AS DOUBLE) / (n_contained + n_container - n_inter) AS jaccard
         |FROM d
         |WHERE CAST(n_inter AS DOUBLE) / n_contained >= $ContTau
         |ORDER BY contained_id, container_id""".stripMargin) { (s, d) =>
      containmentFace(Tables.documents(s, d).select("doc_id", "text"))
    })

  /** The full containment pipeline over an explicit (doc_id, text) frame —
    * shared by the gate and the ×100 scale probe.
    */
  private[graft] def containmentFace(base: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      // 1-row bounded collect: the corpus max, to place planted ids above
      // every organic id (mirrors the oracle's scalar subquery exactly)
      val maxId = base.agg(max(col("doc_id"))).head.getLong(0)
      val compBase = (maxId / 1000 + 1) * 1000
      val comp = base
        .join(base.select(col("doc_id").as("bid"), col("text").as("btext")),
          col("doc_id") + 1 === col("bid"))
        .filter(col("doc_id") % CompEvery === 0)
        .select((col("doc_id") + compBase).as("doc_id"),
          concat(col("text"), lit(" "), col("btext")).as("text"))
      val sh = DedupQueries.shinglePostings(base.union(comp))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).cast("long").as("n"))

      val sized = sh.select(col("doc_id").as("da"), col("sh"))
        .join(sh.select(col("doc_id").as("db"), col("sh")), Seq("sh"))
        .filter(col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1)).cast("long").as("n_inter"))
        .join(sizes.select(col("doc_id").as("da"), col("n").as("n_a")), "da")
        .join(sizes.select(col("doc_id").as("db"), col("n").as("n_b")), "db")

      val dirs = sized.select(col("da").as("contained_id"),
          col("db").as("container_id"), col("n_a").as("n_contained"),
          col("n_b").as("n_container"), col("n_inter"))
        .union(sized.select(col("db"), col("da"), col("n_b"), col("n_a"),
          col("n_inter")))

      dirs
        .withColumn("containment",
          col("n_inter").cast("double") / col("n_contained"))
        .withColumn("jaccard", col("n_inter").cast("double") /
          (col("n_contained") + col("n_container") - col("n_inter")))
        .filter(col("containment") >= ContTau)
        .orderBy("contained_id", "container_id")
  }
}
