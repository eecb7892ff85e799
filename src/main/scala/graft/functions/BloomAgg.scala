package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic Bloom-filter sketch over long keys as a typed
  * Aggregator: bit positions for key h are ((2i+1)*h + i*i + 7) mod m,
  * i < k — the same portable hash family the MinHash signature uses, so
  * an external engine (the DuckDB oracle) can reproduce the EXACT
  * filter, false positives included. State is m/64 longs with bitwise-OR
  * merge — distributive, map-side combinable, constant size regardless
  * of input count (the sketch property that matters at 100 TB).
  *
  * `m` must be a multiple of 64; keys must be non-negative.
  */
final class BloomAgg(m: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(m % 64 == 0, "m must be a multiple of 64")

  override def zero: Array[Long] = new Array[Long](m / 64)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val p = PortableHash.family(i, key, m).toInt
      buf(p >> 6) |= (1L << (p & 63))
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomAgg {
  /** Membership probe against a built filter (driver-side words). */
  def mightContain(words: Array[Long], m: Int, k: Int, key: Long): Boolean = {
    var i = 0
    while (i < k) {
      val p = PortableHash.family(i, key, m).toInt
      if ((words(p >> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
