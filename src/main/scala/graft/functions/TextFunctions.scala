package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the large-scale training-data pipeline
  * (dedup, language-ID, quality scoring, fingerprinting).
  *
  * Everything here is a composition of codegen'd built-in expressions — no
  * UDFs — so the hot path stays inside whole-stage codegen at 100 TB.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** The DuckDB mirror of [[tokens]] over a `text` column — the ONE
    * definition every oracle references (TextPipelineQueries, DedupQueries,
    * ChunkingQueries): a tokenizer tweak applied here and in [[tokens]]
    * keeps every oracle aligned, where per-file copies would silently
    * diverge.
    */
  val toksSql: String =
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)"

  /** Distinct n-word shingles over the token array (default 3-word), the
    * standard unit for near-duplicate detection. Guarded so short documents
    * yield an empty set (Spark's `sequence(1,0)` would count DOWN otherwise).
    */
  def wordShingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature: k independent hash slots, slot s = min over shingles
    * of xxhash64(s, shingle). Null/empty shingle sets hash to an empty
    * signature guarded upstream.
    */
  def minHashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(s =>
      array_min(transform(shingles, sh => xxhash64(lit(s), sh)))): _*)

  /** LSH band keys for a MinHash signature: `bands` buckets of `rowsPerBand`
    * consecutive slots, each band reduced to a single 64-bit key. Two docs
    * land in the same (band_id, band_key) bucket iff a band matches exactly —
    * the classic banding scheme; candidate pairs then get exact-Jaccard
    * verified.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val slots = (0 until rowsPerBand)
        .map(r => element_at(signature, b * rowsPerBand + r + 1).cast("string"))
      struct(lit(b).as("band_id"),
        xxhash64(concat_ws(":", slots: _*)).as("band_key"))
    }: _*)

  /** 64-bit SimHash over a token array: per token, xxhash64 supplies the 64
    * bit fingerprint; each bit votes +1/-1 into 64 counters; positive
    * counters set the output bit. Pure expression tree (aggregate/zip_with),
    * fully codegen'd.
    */
  def simHash64(toks: Column): Column = {
    // bit positions unrolled at plan-build time: shift amounts must be
    // Scala Ints, and a 64-wide literal array stays a single expression tree
    val bitVotes: Column => Column = t => {
      val h = xxhash64(t)
      array((0 until 64).map(i =>
        when(shiftright(h, i).bitwiseAND(1) === 1, lit(1L)).otherwise(lit(-1L))): _*)
    }
    val counters = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, bitVotes(t), (a, b) => a + b))
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(counters, powers, (c, p) => when(c > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Exact word-shingle Jaccard between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      (size(a) + size(b) - size(array_intersect(a, b)))

  /** Heuristic language ID from marker-token hits. Deterministic and
    * SQL-expressible so the oracle can replicate it bit-for-bit; real
    * deployments swap in richer marker lists without changing the plan shape.
    */
  def langIdHeuristic(toks: Column): Column = {
    def hits(markers: Seq[String]): Column =
      size(filter(toks, t => t.isin(markers.map(lit): _*)))
    val en = hits(Seq("the", "a", "of", "and"))
    val es = hits(Seq("el", "la", "de", "y"))
    val de = hits(Seq("der", "die", "das", "und"))
    val fr = hits(Seq("le", "la", "de", "et"))
    when(es > en && es >= de && es >= fr, "es")
      .when(de > en && de >= fr, "de")
      .when(fr > en, "fr")
      .otherwise("en")
  }

  /** Quality-scoring components: alpha ratio, punctuation density, stopword
    * ratio, mean token length — the standard cheap heuristics for filtering
    * web-scale corpora.
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "in", "to", "is")

  def stopwordRatio(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double") /
      nullif(size(toks).cast("double"), lit(0.0))

  def punctDensity(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))).cast("double") /
      nullif(length(text).cast("double"), lit(0.0))

  def meanTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      nullif(size(toks).cast("double"), lit(0.0))

  /** Order-insensitive document fingerprint: md5 of the sorted distinct token
    * bag. Detects shuffled/reordered copies that exact-hash dedup misses.
    */
  def bagFingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))
}
