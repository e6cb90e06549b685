package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.StringDistanceFunctions.damerauLevenshtein

/** Unrestricted Damerau-Levenshtein: kernel known values (including the
  * cases that SEPARATE it from both plain Levenshtein and the restricted
  * OSA variant, cross-checked against DuckDB's damerau_levenshtein), and
  * the Expression's codegen path against the interpreted kernel.
  */
class StringDistanceSpec extends SparkSpec {

  private def dl(a: String, b: String): Int =
    StringDistanceKernel.damerauLevenshtein(a, b)

  test("kernel known values") {
    assert(dl("", "") == 0)
    assert(dl("", "abc") == 3)
    assert(dl("abc", "") == 3)
    assert(dl("abc", "abc") == 0)
    assert(dl("kitten", "sitting") == 3) // pure Levenshtein case
    assert(dl("ab", "ba") == 1) // one transposition (Levenshtein would say 2)
    assert(dl("abcdef", "abdcef") == 1) // interior transposition
    // THE unrestricted-vs-OSA separator (DuckDB agrees: 2; OSA says 3):
    // transpose "ca"→"ac", then insert 'b' INSIDE the transposed pair.
    assert(dl("ca", "abc") == 2)
    assert(dl("a cat", "an act") == 2) // insertion + transposition
    assert(dl("Customer#000000042", "Customer#000000024") == 1)
  }

  test("triangle-ish sanity: dl <= levenshtein, dl differs on swaps") {
    val pairs = Seq("Customer#000000012" -> "Customer#000000013",
      "abcd" -> "abdc", "hello" -> "ehllo", "xy" -> "yx")
    pairs.foreach { case (a, b) =>
      val lev = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(a, b)
      assert(dl(a, b) <= lev, s"dl($a,$b) must not exceed levenshtein")
    }
    assert(dl("xy", "yx") == 1)
  }

  test("expression: codegen result matches kernel, nulls propagate") {
    val df = spark.createDataFrame(Seq(
      ("ca", "abc"), ("ab", "ba"), ("kitten", "sitting"), ("same", "same")))
      .toDF("a", "b")
    val got = df.select(damerauLevenshtein(col("a"), col("b")).as("d"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(2, 1, 3, 0))
    val withNull = df.select(
      damerauLevenshtein(lit(null).cast("string"), col("b")).as("d"))
      .collect().map(r => r.isNullAt(0))
    assert(withNull.forall(identity), "NULL input must yield NULL")
  }
}
