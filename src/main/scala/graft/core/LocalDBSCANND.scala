package graft.core

import scala.collection.mutable

/** An n-D labeled point: full coordinate vector + cluster id + flag. */
final case class LabeledPtN(coords: Array[Double], cluster: Int, flag: String)

/** Single-task DBSCAN over n-dimensional points — the generalization of
  * the 2-D [[LocalDBSCAN]] core (which remains the specialized fast path
  * the distributed spatial pipeline runs; [[graft.core.LocalDBSCAN]]'s
  * tuple-keyed 3x3 grid is exactly this structure at `gridDims = 2`, and
  * LocalDBSCANNDSpec asserts label-for-label parity on the golden
  * fixture).
  *
  * The uniform-grid neighbor index covers only the first
  * `min(gridDims, d)` coordinates: cells of side `eps` in that subspace,
  * candidates from the 3^k cell block, exact distance checked in FULL
  * d-dimensional space. Projection indexing is correct for any d
  * (distance in the full space bounds distance in any coordinate
  * subspace, so all true eps-neighbors land inside the projected 3^k
  * block) and sidesteps the curse of dimensionality in the index: 3^d
  * cell blocks would be useless at d = 64, while k = 2-3 keeps lookup
  * O(3^k * bucket) with pruning as good as the projected spread allows.
  * Visit order, flag semantics (`reclaimBorder`), and cluster numbering
  * (1..k in discovery order, 0 = noise) are identical to the 2-D core —
  * reference border-semantics contract per LocalDBSCANNaive.scala:105-108
  * vs LocalDBSCANArchery.scala:103-106.
  *
  * Cell offsets are enumerated lexicographically (first dim outermost),
  * matching the 2-D core's dx-outer/dy-inner loop, so neighbor lists —
  * and therefore discovery order and border ownership — match bit for
  * bit at gridDims = 2.
  */
final class LocalDBSCANND(
    eps: Double,
    minPoints: Int,
    reclaimBorder: Boolean = false,
    gridDims: Int = 2) {

  require(gridDims >= 1, s"gridDims must be >= 1, got $gridDims")

  private val epsSq = eps * eps

  private final val UNKNOWN = 0

  def fit(points: IndexedSeq[Array[Double]]): IndexedSeq[LabeledPtN] = {
    val n = points.length
    if (n == 0) return Vector.empty
    val dim = points(0).length
    val k = math.min(gridDims, dim)

    val cluster = Array.fill(n)(UNKNOWN)
    // flags: 0 = not flagged, 1 = noise, 2 = core, 3 = border
    val flag = new Array[Byte](n)
    val visited = new Array[Boolean](n)

    def distSq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val diff = a(d) - b(d)
        acc += diff * diff
        d += 1
      }
      acc
    }

    def cellKey(p: Array[Double]): Vector[Long] = {
      val key = new Array[Long](k)
      var d = 0
      while (d < k) {
        key(d) = math.floor(p(d) / eps).toLong
        d += 1
      }
      key.toVector
    }

    val index = mutable.HashMap.empty[Vector[Long], mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < n) {
      index.getOrElseUpdate(cellKey(points(i)), mutable.ArrayBuffer.empty[Int]) += i
      i += 1
    }

    def neighbors(i: Int): mutable.ArrayBuffer[Int] = {
      val p = points(i)
      val center = cellKey(p)
      val out = mutable.ArrayBuffer.empty[Int]
      // lexicographic odometer over {-1,0,1}^k, first dim outermost
      val off = Array.fill(k)(-1L)
      var done = false
      while (!done) {
        val key = Vector.tabulate(k)(d => center(d) + off(d))
        index.get(key) match {
          case Some(bucket) =>
            var j = 0
            while (j < bucket.length) {
              val q = bucket(j)
              if (distSq(p, points(q)) <= epsSq) out += q
              j += 1
            }
          case None =>
        }
        var d = k - 1
        while (d >= 0 && off(d) == 1L) { off(d) = -1L; d -= 1 }
        if (d < 0) done = true else off(d) += 1L
      }
      out
    }

    def expand(seed: Int, seedNbrs: mutable.ArrayBuffer[Int], c: Int): Unit = {
      flag(seed) = 2
      cluster(seed) = c
      val queue = mutable.Queue(seedNbrs)
      while (queue.nonEmpty) {
        val batch = queue.dequeue()
        var j = 0
        while (j < batch.length) {
          val q = batch(j)
          if (!visited(q)) {
            visited(q) = true
            cluster(q) = c
            val qn = neighbors(q)
            if (qn.length >= minPoints) {
              flag(q) = 2
              queue.enqueue(qn)
            } else {
              flag(q) = 3
            }
          } else if (reclaimBorder && cluster(q) == UNKNOWN) {
            cluster(q) = c
            flag(q) = 3
          }
          j += 1
        }
      }
    }

    var nextCluster = 0
    i = 0
    while (i < n) {
      if (!visited(i)) {
        visited(i) = true
        val nbrs = neighbors(i)
        if (nbrs.length < minPoints) {
          flag(i) = 1
        } else {
          nextCluster += 1
          expand(i, nbrs, nextCluster)
        }
      }
      i += 1
    }

    val out = new Array[LabeledPtN](n)
    i = 0
    while (i < n) {
      val f = flag(i) match {
        case 2 => Flag.Core
        case 3 => Flag.Border
        case _ => Flag.Noise
      }
      out(i) = LabeledPtN(points(i), cluster(i), f)
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}
