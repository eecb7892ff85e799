package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k (score, id) aggregator — the k-NN-graph merge shape.
  *
  * Keeps the k best (score DESC, id ASC) pairs seen so far as two
  * parallel sorted arrays; reduce is a binary-search insert that
  * rejects sub-threshold rows without allocation, merge is a sorted
  * merge-truncate. Associative and commutative, so Spark's hash
  * aggregate folds per-cell candidate lists into O(k) partial states
  * map-side and the shuffle carries k entries per (group, mapper)
  * instead of the whole candidate set — at 100 TB this is the
  * difference between shuffling n·nprobe·cell_size scored rows
  * (window-rank top-k) and n·nprobe·k.
  *
  * Tie order matches the board convention everywhere (higher score
  * wins, then lower id). NaN scores are REJECTED at reduce: admitted
  * into a buffer they would be unorderable — a NaN tail entry makes
  * every later `before` comparison false and silently blocks real
  * entries (caught by KnnGraphSpec's NaN test on the first cut).
  */
final class TopKCosAgg(k: Int)
    extends Aggregator[(Long, Double), (Array[Long], Array[Double]),
      Seq[(Long, Double)]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def zero: (Array[Long], Array[Double]) =
    (Array.emptyLongArray, Array.emptyDoubleArray)

  // strict "a before b" under (score DESC, id ASC)
  private def before(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa > sb || (sa == sb && ia < ib)

  override def reduce(buf: (Array[Long], Array[Double]),
      in: (Long, Double)): (Array[Long], Array[Double]) = {
    val (ids, ss) = buf
    val (id, s) = in
    if (s.isNaN) return buf
    val n = ids.length
    if (n == k && !before(s, id, ss(n - 1), ids(n - 1))) return buf
    // first position whose entry sorts after the new one
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(s, id, ss(mid), ids(mid))) hi = mid else lo = mid + 1
    }
    val m = math.min(n + 1, k)
    val oi = new Array[Long](m)
    val os = new Array[Double](m)
    System.arraycopy(ids, 0, oi, 0, lo)
    System.arraycopy(ss, 0, os, 0, lo)
    oi(lo) = id
    os(lo) = s
    System.arraycopy(ids, lo, oi, lo + 1, m - lo - 1)
    System.arraycopy(ss, lo, os, lo + 1, m - lo - 1)
    (oi, os)
  }

  override def merge(a: (Array[Long], Array[Double]),
      b: (Array[Long], Array[Double])): (Array[Long], Array[Double]) = {
    if (b._1.isEmpty) return a
    if (a._1.isEmpty) return b
    val m = math.min(a._1.length + b._1.length, k)
    val oi = new Array[Long](m)
    val os = new Array[Double](m)
    var i = 0
    var j = 0
    var o = 0
    while (o < m) {
      val takeA = j >= b._1.length || (i < a._1.length &&
        before(a._2(i), a._1(i), b._2(j), b._1(j)))
      if (takeA) { oi(o) = a._1(i); os(o) = a._2(i); i += 1 }
      else { oi(o) = b._1(j); os(o) = b._2(j); j += 1 }
      o += 1
    }
    (oi, os)
  }

  override def finish(buf: (Array[Long], Array[Double])): Seq[(Long, Double)] =
    buf._1.toSeq.zip(buf._2.toSeq)

  override def bufferEncoder: Encoder[(Array[Long], Array[Double])] =
    ExpressionEncoder[(Array[Long], Array[Double])]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
