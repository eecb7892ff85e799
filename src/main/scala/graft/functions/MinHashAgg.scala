package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator computing a k-permutation MinHash signature from a
  * stream of shingle hashes: minhash_i = min over s of ((2i+1)*s + i*i+7) mod p.
  *
  * A distributive aggregate with O(k) state — the scale-correct shape:
  * partial signatures combine element-wise on the map side, so a
  * document's shingle set is never materialized (unlike collect_set),
  * and the shuffle carries k longs per document regardless of document
  * size.
  */
final class MinHashAgg(k: Int, p: Long)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sh: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = PortableHash.family(i, sh, p)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
