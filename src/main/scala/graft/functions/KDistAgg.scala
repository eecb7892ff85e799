package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact k-th-smallest-distance aggregate with BOUNDED state — the
  * production spelling of "4th nearest neighbor per probe": state is
  * the k smallest (d2, id) pairs seen so far (ties ordered by id, so
  * the result is deterministic and oracle-replayable), partials merge
  * map-side, and the shuffle carries at most k pairs per probe instead
  * of the whole probe x corpus pair stream (q49 measured 29 s with a
  * global window vs ~1 s with this aggregate at sf0.1).
  * finish() returns the k-th smallest squared distance, or NaN when
  * the corpus had fewer than k other points (callers filter NaN).
  */
final class KDistAgg(k: Int)
    extends Aggregator[(Long, Double, Long), List[(Double, Long)], Double] {

  private def insert(buf: List[(Double, Long)],
      e: (Double, Long)): List[(Double, Long)] = {
    val merged = (e :: buf).sortBy(identity)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)],
      row: (Long, Double, Long)): List[(Double, Long)] =
    insert(buf, (row._2, row._3))

  override def merge(a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] = {
    val merged = (a ++ b).sortBy(identity)
    if (merged.length > k) merged.take(k) else merged
  }

  override def finish(buf: List[(Double, Long)]): Double =
    if (buf.length >= k) buf(k - 1)._1 else Double.NaN

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
