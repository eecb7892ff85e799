package graft.core

import scala.annotation.tailrec

/** Cost-based binary space partitioning over a grid-cell histogram.
  *
  * Driver-side planning (input is the collected, O(#cells) histogram —
  * never raw points). Recursively splits the bounding box of all cells:
  * any box holding more than `maxPointsPerPartition` points is cut at the
  * grid line (multiples of `cellSize` from the box corner, along x or y)
  * that best balances the two halves; unsplittable overfull boxes are
  * kept with a warning. Empty partitions are dropped.
  *
  * Mirrors the reference planner's semantics (reference:
  * EvenSplitPartitioner.scala:44-168 — candidate splits every cellSize,
  * cost = |count/2 - countIn(candidate)|, canBeSplit when either side
  * exceeds 2*cellSize, counts sum fully-contained cells) with a
  * deterministic tie-break (lowest cost, then x-cuts before y-cuts, then
  * smallest cut coordinate) so plans are stable across runs.
  */
object SpacePartitioner {

  type CellCount = (Rect, Int)

  def partition(
      cells: Set[CellCount],
      maxPointsPerPartition: Long,
      cellSize: Double): List[CellCount] = {
    if (cells.isEmpty) return Nil
    val bounding = boundingRect(cells)
    // Sorted array for deterministic iteration; counts are over
    // fully-contained cells.
    val cellArr = cells.toArray.sortBy(c => (c._1.x, c._1.y))

    def pointsIn(r: Rect): Int = {
      var total = 0
      var i = 0
      while (i < cellArr.length) {
        if (r.contains(cellArr(i)._1)) total += cellArr(i)._2
        i += 1
      }
      total
    }

    @tailrec
    def loop(remaining: List[CellCount], done: List[CellCount]): List[CellCount] =
      remaining match {
        case Nil => done
        case (rect, count) :: rest =>
          if (count > maxPointsPerPartition && canBeSplit(rect, cellSize)) {
            val (a, b) = bestSplit(rect, pointsIn, cellSize)
            loop((a, pointsIn(a)) :: (b, pointsIn(b)) :: rest, done)
          } else {
            loop(rest, (rect, count) :: done)
          }
      }

    loop(List((bounding, pointsIn(bounding))), Nil)
      .filter(_._2 > 0)
      .reverse
  }

  /** Candidate cuts: sub-boxes anchored at the lower-left corner ending at
    * each interior grid line along x, then along y.
    */
  private[core] def candidateSplits(box: Rect, cellSize: Double): Seq[Rect] = {
    val xCuts = Iterator
      .iterate(box.x + cellSize)(_ + cellSize)
      .takeWhile(_ < box.x2)
      .map(cx => Rect(box.x, box.y, cx, box.y2))
      .toSeq
    val yCuts = Iterator
      .iterate(box.y + cellSize)(_ + cellSize)
      .takeWhile(_ < box.y2)
      .map(cy => Rect(box.x, box.y, box.x2, cy))
      .toSeq
    xCuts ++ yCuts
  }

  private def bestSplit(
      box: Rect,
      pointsIn: Rect => Int,
      cellSize: Double): (Rect, Rect) = {
    val half = pointsIn(box) / 2
    val best = candidateSplits(box, cellSize)
      .minBy(c => math.abs(half - pointsIn(c)).toLong) // stable minBy = deterministic tie-break
    (best, complement(best, box))
  }

  /** The part of `boundary` not covered by `box` (box shares the lower-left
    * corner and one full side with the boundary, by construction).
    */
  private[core] def complement(box: Rect, boundary: Rect): Rect =
    if (box.y2 == boundary.y2) Rect(box.x2, box.y, boundary.x2, boundary.y2)
    else Rect(box.x, box.y2, boundary.x2, boundary.y2)

  private[core] def canBeSplit(box: Rect, cellSize: Double): Boolean =
    box.width > cellSize * 2 || box.height > cellSize * 2

  private[core] def boundingRect(cells: Set[CellCount]): Rect =
    cells.foldLeft(Rect(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)) {
      case (b, (c, _)) =>
        Rect(b.x.min(c.x), b.y.min(c.y), b.x2.max(c.x2), b.y2.max(c.y2))
    }
}
