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

  // Input values arrive BOXED (java.lang.Long): with a primitive input
  // encoder a NULL input row silently decodes as 0L and permanently occupies
  // the minimum slot (the r13 advice finding — every caller had to carry a
  // manual .filter(isNotNull)). Boxing moves the null contract inside the
  // aggregator: reduce skips nulls, so `kmin` is null-safe at the API
  // boundary like every builtin aggregate.
  private final class KMin(k: Int)
      extends Aggregator[java.lang.Long, Buf, Array[Long]] {
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

    override def reduce(b: Buf, v: java.lang.Long): Buf =
      if (v == null) b else Buf(insert(b.mins, v.longValue))

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

  /** `kmin(col, k)` as an untyped aggregate Column over a LONG column.
    * NULL inputs are skipped (never 0-coerced) — builtin-aggregate
    * semantics, enforced inside the aggregator.
    */
  def kmin(col: Column, k: Int): Column = {
    require(k > 0, s"k must be positive, got $k")
    udaf(new KMin(k), Encoders.LONG)(col)
  }

  // ----- keyed variant: bottom-k rows by (hash, id), payload carried -----

  /** One (sort key, payload id) pair; the aggregator orders by (h, id), so
    * ties on h (astronomically rare with a 48-bit hash, but defined) break
    * deterministically.
    */
  final case class HId(h: Long, id: Long)
  /** Boxed input twin of [[HId]]: a NULL hash or id column must be SKIPPED,
    * not decoded as 0 (same advice finding as [[KMin]]'s input).
    */
  final case class HIdIn(h: java.lang.Long, id: java.lang.Long)
  final case class BufBy(mins: Array[Long]) // packed pairs [h0,id0,h1,id1,…]

  private final class KMinBy(k: Int) extends Aggregator[HIdIn, BufBy, Array[HId]] {
    // pairs are kept FLAT in a long array (2 slots per element, sorted by
    // (h, id)) so the buffer encoder stays a primitive-array product —
    // no nested-struct serialization per merge
    override def zero: BufBy = BufBy(Array.emptyLongArray)

    private def lt(h1: Long, i1: Long, h2: Long, i2: Long): Boolean =
      h1 < h2 || (h1 == h2 && i1 < i2)

    override def reduce(b: BufBy, vIn: HIdIn): BufBy = {
      if (vIn.h == null || vIn.id == null) return b // skip null rows
      val v = HId(vIn.h.longValue, vIn.id.longValue)
      val a = b.mins
      val n = a.length / 2
      if (n >= k && !lt(v.h, v.id, a(2 * k - 2), a(2 * k - 1))) b
      else {
        // binary search for insertion point by (h, id)
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (lt(a(2 * mid), a(2 * mid + 1), v.h, v.id)) lo = mid + 1 else hi = mid
        }
        if (lo < n && a(2 * lo) == v.h && a(2 * lo + 1) == v.id) b // dup
        else {
          val m = math.min(n + 1, k)
          val out = new Array[Long](2 * m)
          System.arraycopy(a, 0, out, 0, 2 * lo)
          out(2 * lo) = v.h; out(2 * lo + 1) = v.id
          System.arraycopy(a, 2 * lo, out, 2 * lo + 2, 2 * m - 2 * lo - 2)
          BufBy(out)
        }
      }
    }

    override def merge(b1: BufBy, b2: BufBy): BufBy = {
      val a = b1.mins; val b = b2.mins
      val out = new Array[Long](math.min(a.length + b.length, 2 * k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length ||
          (i < a.length && lt(a(i), a(i + 1), b(j), b(j + 1))) ||
          (i < a.length && a(i) == b(j) && a(i + 1) == b(j + 1))
        val (h, id) = if (takeA) (a(i), a(i + 1)) else (b(j), b(j + 1))
        if (takeA) {
          // skip an identical pair on the other side (dedup)
          if (j < b.length && b(j) == h && b(j + 1) == id) j += 2
          i += 2
        } else j += 2
        out(o) = h; out(o + 1) = id; o += 2
      }
      BufBy(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }

    override def finish(b: BufBy): Array[HId] =
      Array.tabulate(b.mins.length / 2)(i => HId(b.mins(2 * i), b.mins(2 * i + 1)))
    override def bufferEncoder: Encoder[BufBy] = Encoders.product[BufBy]
    override def outputEncoder: Encoder[Array[HId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[HId]]()
  }

  /** `kminBy(hashCol, idCol, k)`: the group's k smallest (hash, id) pairs
    * as a sorted array of structs — the bounded-memory face of per-group
    * uniform sampling (bottom-k by a seeded hash IS a uniform
    * without-replacement sample, deterministic and merge-order-invariant).
    * Every partial buffer holds ≤ k pairs; contrast with a per-group rank
    * window, which sorts the whole group.
    */
  def kminBy(hash: Column, id: Column, k: Int): Column = {
    require(k > 0, s"k must be positive, got $k")
    // the product input encoder flattens to a 2-argument aggregate; boxed
    // fields so a null in either column skips the row instead of becoming 0
    udaf(new KMinBy(k), Encoders.product[HIdIn])(hash, id)
  }
}
