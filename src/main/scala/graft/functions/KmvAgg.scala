package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values / bottom-k) distinct-count sketch over
  * pre-hashed long values (Bar-Yossef et al. 2002; Beyer et al.,
  * SIGMOD'07): keep the k smallest DISTINCT hash values; if fewer than
  * k distinct hashes were seen the count is exact, otherwise the
  * unbiased estimate is (k-1) · M / h_k with h_k the k-th smallest hash
  * and M the hash domain size.
  *
  * Why KMV and not HLL here: with the engine's portable integer hash
  * ([[PortableHash]], domain [0, mod)) the sketch — and therefore the
  * estimate — is a DETERMINISTIC function of the value set, independent
  * of partitioning, merge order, and engine. The DuckDB oracle
  * reproduces it bit-for-bit from `list_sort(list(DISTINCT h))`; an HLL
  * register array has no such cross-engine spelling. Same accuracy
  * class (rel. error ~ 1/sqrt(k)).
  *
  * Input CONTRACT: values must already be hashed onto [0, mod) with a
  * LARGE multiplier — h(x) = (a·(x mod m) + b) mod m, a ~ m — so small
  * key domains spread over the whole range (the estimator reads the
  * k-th smallest value as a uniformity probe; [[PortableHash]]'s i=1
  * member has multiplier 3 and would collapse small ids into a tiny
  * prefix of the domain, inflating the estimate by orders of
  * magnitude).
  *
  * State is a sorted long array of at most k entries (O(k) bytes);
  * reduce is binary-search insert (values above the current k-th
  * minimum are rejected without allocation); merge is a sorted-array
  * merge keeping distinct minima — associative and commutative, so
  * map-side partial aggregation is exact. 100 TB shape: one pass, tiny
  * state per group, no shuffle of raw values beyond the partial
  * sketches.
  */
final class KmvAgg(k: Int, mod: Long = 1000000007L)
    extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf // already present
    else {
      val ins = -i - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) { // displaces the current maximum
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted merge, distinct, first k
    val out = new Array[Long](math.min(a.length + b.length, k))
    var (i, j, n) = (0, 0, 0)
    var last = Long.MinValue
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || v != last) { out(n) = v; n += 1; last = v }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * mod / buf(k - 1)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** [[KmvAgg]] variant that surfaces the SKETCH itself (the sorted
  * bottom-k distinct hash array) instead of collapsing it to the
  * distinct-count estimate — the mergeable object a sketch ALGEBRA
  * needs: union two sketches by sorted-distinct-merge-truncate, then
  * estimate |A∪B| from the merged k-th minimum and Jaccard from the
  * bottom-k overlap fraction (Beyer et al., SIGMOD'07 §4). Same state,
  * reduce, and merge as [[KmvAgg]]; only `finish` differs, so the two
  * can never drift.
  */
final class KmvSketchAgg(k: Int, mod: Long = 1000000007L)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  private val core = new KmvAgg(k, mod)
  override def zero: Array[Long] = core.zero
  override def reduce(buf: Array[Long], h: Long): Array[Long] = core.reduce(buf, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = core.merge(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
