package graft.functions

/** Unrestricted Damerau-Levenshtein distance (Lowrance & Wagner 1975,
  * "An extension of the string-to-string correction problem"): minimum
  * number of insertions, deletions, substitutions and transpositions of
  * ADJACENT characters, where (unlike the restricted/OSA variant Spark's
  * built-in `levenshtein` family lacks entirely) a transposed pair may be
  * edited again later — e.g. dl("ca", "abc") = 2, where OSA gives 3.
  *
  * This is the exact algorithm DuckDB implements for its
  * `damerau_levenshtein` scalar (verified empirically: "ca"→"abc" = 2,
  * "ab"→"ba" = 1), which is what lets the expression wrapping this kernel
  * be oracle-gated cross-engine with an integer-exact hash compare.
  *
  * Called from generated code (see
  * [[org.apache.spark.sql.graft.DamerauLevenshtein]]), so it must stay a
  * plain static-forwardable object method with no Spark types in the
  * signature. O(|a|·|b|) time, O(|a|·|b|) space — callers bound input
  * length (the repo's queries compare short keys/names, not documents).
  */
object StringDistanceKernel {

  def damerauLevenshtein(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // d is offset by +1 in both dimensions: row/col 0 hold the `inf`
    // sentinel the transposition recurrence reads past the matrix edge.
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    // last row index (1-based) at which each character of the alphabet
    // occurred in `a` — the sparse "da" array of Lowrance-Wagner
    val lastRowOfChar = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var lastColThisRow = 0 // "db": last column matched within this row
      j = 1
      while (j <= lb) {
        val i1 = {
          val v = lastRowOfChar.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue()
        }
        val j1 = lastColThisRow
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { lastColThisRow = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val transp = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, transp))
        j += 1
      }
      lastRowOfChar.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}
