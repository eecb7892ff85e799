package graft.core

/** Immutable, serializable STR-packed R-tree over (Rect, id) entries.
  *
  * Built once on the driver from the space-partition margins and
  * broadcast; executors answer "which partitions' outer boxes contain
  * (x, y)?" in O(log P + hits) instead of the reference's O(P) linear
  * scan per point (reference: DBSCAN.scala:108-112 iterates the whole
  * broadcast margin list for every point). At 100 TB the partition count
  * P ~ N / maxPointsPerPartition is tens of thousands, so the per-point
  * scan is the difference between a constant and a P-factor in the map
  * stage.
  *
  * Construction is the standard Sort-Tile-Recursive bulk-load
  * (Leutenegger et al., 1997): sort by x-center, slice into vertical
  * strips, sort each strip by y-center, chunk into leaves, then build
  * upper levels the same way.
  */
final class BoxIndex private (
    root: BoxIndex.Node) extends Serializable {

  /** Ids of all boxes containing (x, y) (closed bounds). */
  def query(x: Double, y: Double): List[Int] = {
    var out: List[Int] = Nil
    def go(n: BoxIndex.Node): Unit = n match {
      case BoxIndex.Leaf(bounds, entries) =>
        if (bounds.contains(x, y)) {
          var i = 0
          while (i < entries.length) {
            if (entries(i)._1.contains(x, y)) out = entries(i)._2 :: out
            i += 1
          }
        }
      case BoxIndex.Branch(bounds, children) =>
        if (bounds.contains(x, y)) children.foreach(go)
    }
    go(root)
    out
  }
}

object BoxIndex {
  private val LeafCapacity = 16

  sealed trait Node extends Serializable { def bounds: Rect }
  final case class Leaf(bounds: Rect, entries: Array[(Rect, Int)]) extends Node
  final case class Branch(bounds: Rect, children: Array[Node]) extends Node

  private def boundsOf(rects: Iterable[Rect]): Rect =
    rects.foldLeft(Rect(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)) {
      (b, r) => Rect(b.x.min(r.x), b.y.min(r.y), b.x2.max(r.x2), b.y2.max(r.y2))
    }

  def build(entries: Seq[(Rect, Int)]): BoxIndex = {
    require(entries.nonEmpty, "BoxIndex needs at least one box")
    val leaves: Array[Node] = pack(entries.toArray)(e => e._1)
      .map(chunk => Leaf(boundsOf(chunk.map(_._1)), chunk))
    var level = leaves
    while (level.length > 1) {
      level = pack(level)(_.bounds).map(chunk => Branch(boundsOf(chunk.map(_.bounds)), chunk))
    }
    new BoxIndex(level(0))
  }

  /** STR tiling: returns chunks of size <= LeafCapacity. */
  private def pack[A: reflect.ClassTag](items: Array[A])(rect: A => Rect): Array[Array[A]] = {
    val n = items.length
    val nChunks = math.max(1, math.ceil(n.toDouble / LeafCapacity).toInt)
    val nStrips = math.max(1, math.ceil(math.sqrt(nChunks.toDouble)).toInt)
    val stripSize = math.max(1, math.ceil(n.toDouble / nStrips).toInt)
    items
      .sortBy(a => { val r = rect(a); (r.x + r.x2, r.y + r.y2) })
      .grouped(stripSize)
      .flatMap(strip =>
        strip.sortBy(a => { val r = rect(a); (r.y + r.y2, r.x + r.x2) })
          .grouped(LeafCapacity))
      .toArray
  }
}
