package graft.core

import scala.collection.mutable

/** Point labels produced by DBSCAN. */
object Flag {
  val Noise = "noise"
  val Core = "core"
  val Border = "border"
}

final case class LabeledPt(x: Double, y: Double, cluster: Int, flag: String)

/** Single-task DBSCAN over one spatial partition's points.
  *
  * Algorithm: classic DBSCAN (Ester et al., KDD'96) with a uniform-grid
  * neighbor index of cell side `eps` — neighbor candidates live in the
  * 3x3 cell block around a point, so `fit` is O(n * k) for k the mean
  * neighborhood size instead of the reference's O(n^2) linear scan
  * (reference: LocalDBSCANNaive.scala:26-27,70-75).
  *
  * Border semantics are configurable because the reference ships two
  * variants that disagree (reference: LocalDBSCANNaive.scala:105-108 has
  * the re-claim check dead inside the !visited guard; LocalDBSCANArchery
  * .scala:103-106 has it live):
  *   - `reclaimBorder = false` (Naive, used by the reference's
  *     distributed path — DBSCAN.scala:121): a point already visited as
  *     noise is never re-claimed as Border by a later cluster.
  *   - `reclaimBorder = true` (Archery/standard): it is.
  *
  * Cluster ids are 1..k in discovery order; 0 = noise/unassigned.
  * Callers should pass points in a deterministic order (e.g. sorted by
  * (x, y)) for reproducible labels — discovery order and border
  * ownership are visit-order dependent in any DBSCAN.
  */
final class LocalDBSCAN(
    eps: Double,
    minPoints: Int,
    reclaimBorder: Boolean = false) {

  private val epsSq = eps * eps

  private final val UNKNOWN = 0

  def fit(points: IndexedSeq[Pt]): IndexedSeq[LabeledPt] = {
    val n = points.length
    val cluster = Array.fill(n)(UNKNOWN)
    // flags: 0 = not flagged, 1 = noise, 2 = core, 3 = border
    val flag = new Array[Byte](n)
    val visited = new Array[Boolean](n)

    // Grid index: cell side = eps, so all eps-neighbors of a point are in
    // the surrounding 3x3 cells.
    val index = mutable.HashMap.empty[(Long, Long), mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < n) {
      val p = points(i)
      val key = (math.floor(p.x / eps).toLong, math.floor(p.y / eps).toLong)
      index.getOrElseUpdate(key, mutable.ArrayBuffer.empty[Int]) += i
      i += 1
    }

    def neighbors(i: Int): mutable.ArrayBuffer[Int] = {
      val p = points(i)
      val cx = math.floor(p.x / eps).toLong
      val cy = math.floor(p.y / eps).toLong
      val out = mutable.ArrayBuffer.empty[Int]
      var dx = -1L
      while (dx <= 1L) {
        var dy = -1L
        while (dy <= 1L) {
          index.get((cx + dx, cy + dy)) match {
            case Some(bucket) =>
              var j = 0
              while (j < bucket.length) {
                val q = bucket(j)
                if (p.distanceSquared(points(q)) <= epsSq) out += q
                j += 1
              }
            case None =>
          }
          dy += 1L
        }
        dx += 1L
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
            // Archery-style: a previously-visited noise point within eps
            // of a core point becomes Border of this cluster.
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
          flag(i) = 1 // noise (may be re-claimed later if reclaimBorder)
        } else {
          nextCluster += 1
          expand(i, nbrs, nextCluster)
        }
      }
      i += 1
    }

    val out = new Array[LabeledPt](n)
    i = 0
    while (i < n) {
      val f = flag(i) match {
        case 2 => Flag.Core
        case 3 => Flag.Border
        case _ => Flag.Noise
      }
      out(i) = LabeledPt(points(i).x, points(i).y, cluster(i), f)
      i += 1
    }
    out
  }
}
