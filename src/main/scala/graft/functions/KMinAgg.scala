package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded k-min aggregate: the k smallest DISTINCT longs of the group, as
  * a sorted array — the exact aggregation law a KMV sketch needs
  * (Bar-Yossef et al. 2002), with the memory contract a 100 TB group-by
  * requires: every partial buffer holds AT MOST k values at every moment of
  * the aggregation, map-side partials included.
  *
  * This replaces the `slice(array_sort(collect_set(hv)), 1, k)` shape whose
  * collect_set grows with the group's full distinct count BEFORE the slice
  * (unbounded executor memory on a hot group — the r12 advice finding on
  * `StreamOps.dailyDistinctKmv`). Here `reduce` rejects any value ≥ the
  * current k-th minimum once the buffer is full, so a group with a billion
  * distinct hashes still costs k longs per partial.
  *
  * Result is the k smallest distinct values — a set function, so it is
  * invariant under partial split/merge order (ScalaCheck-proven in
  * KMinAggSpec); duplicates never occupy slots (KMV needs distinct order
  * statistics, not a multiset).
  */
object KMinAgg {

  /** Sorted distinct buffer, ≤ k elements; wrapped in a case class so the
    * buffer encoder is a plain product encoder.
    */
  final case class Buf(mins: Array[Long])

  private final class KMin(k: Int) extends Aggregator[Long, Buf, Array[Long]] {
    override def zero: Buf = Buf(Array.emptyLongArray)

    /** Insert preserving sort+distinct, dropping the largest once > k.
      * O(log k) search + O(k) arraycopy — k is a sketch constant (256),
      * not data-dependent.
      */
    private def insert(a: Array[Long], v: Long): Array[Long] = {
      val i = java.util.Arrays.binarySearch(a, v)
      if (i >= 0) a // already present: distinct order statistics only
      else {
        val p = -(i + 1)
        if (a.length >= k && p >= k) a // ≥ current k-th min: can't matter
        else {
          val n = new Array[Long](math.min(a.length + 1, k))
          System.arraycopy(a, 0, n, 0, p)
          n(p) = v
          System.arraycopy(a, p, n, p + 1, n.length - p - 1)
          n
        }
      }
    }

    override def reduce(b: Buf, v: Long): Buf = Buf(insert(b.mins, v))

    override def merge(b1: Buf, b2: Buf): Buf = {
      // merge-sort the two sorted distinct arrays, dedup, stop at k
      val a = b1.mins; val b = b2.mins
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < k && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      Buf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }

    override def finish(b: Buf): Array[Long] = b.mins
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** `kmin(col, k)` as an untyped aggregate Column over a LONG column. */
  def kmin(col: Column, k: Int): Column = {
    require(k > 0, s"k must be positive, got $k")
    udaf(new KMin(k), Encoders.scalaLong)(col)
  }
}
