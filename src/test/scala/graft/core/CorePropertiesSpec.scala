package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck invariants for the clustering core (SURVEY.md §5):
  * DBSCAN label semantics, space-partitioner coverage/balance, grid-snap
  * bounds, and MinHash signature algebra.
  */
object CorePropertiesSpec extends Properties("graft.core") {

  // ---- generators ----

  private val genPoint: Gen[Pt] = for {
    x <- Gen.chooseNum(-10.0, 10.0)
    y <- Gen.chooseNum(-10.0, 10.0)
  } yield Pt(x, y)

  private val genPoints: Gen[Vector[Pt]] =
    Gen.chooseNum(0, 120).flatMap(n => Gen.containerOfN[Vector, Pt](n, genPoint))

  private val genEps: Gen[Double] = Gen.chooseNum(0.5, 3.0)
  private val genMinPts: Gen[Int] = Gen.chooseNum(2, 6)

  private def neighborCount(pts: IndexedSeq[Pt], i: Int, eps: Double): Int = {
    val epsSq = eps * eps
    pts.count(q => pts(i).distanceSquared(q) <= epsSq) // includes self, like the engine
  }

  // ---- DBSCAN invariants ----

  property("core flag iff >= minPoints eps-neighbors") =
    forAll(genPoints, genEps, genMinPts) { (pts, eps, minPts) =>
      val labeled = new LocalDBSCAN(eps, minPts).fit(pts)
      labeled.zipWithIndex.forall { case (lp, i) =>
        (lp.flag == Flag.Core) == (neighborCount(pts, i, eps) >= minPts)
      }
    }

  property("noise iff cluster 0; border/core points carry a cluster id") =
    forAll(genPoints, genEps, genMinPts) { (pts, eps, minPts) =>
      new LocalDBSCAN(eps, minPts).fit(pts).forall { lp =>
        if (lp.flag == Flag.Noise) lp.cluster == 0 else lp.cluster > 0
      }
    }

  property("border points lie within eps of a core point of their cluster") =
    forAll(genPoints, genEps, genMinPts) { (pts, eps, minPts) =>
      val labeled = new LocalDBSCAN(eps, minPts).fit(pts)
      val epsSq = eps * eps
      labeled.filter(_.flag == Flag.Border).forall { b =>
        labeled.exists(c => c.flag == Flag.Core && c.cluster == b.cluster &&
          Pt(b.x, b.y).distanceSquared(Pt(c.x, c.y)) <= epsSq)
      }
    }

  property("cluster ids are dense 1..k") =
    forAll(genPoints, genEps, genMinPts) { (pts, eps, minPts) =>
      val ids = new LocalDBSCAN(eps, minPts).fit(pts)
        .filter(_.cluster != 0).map(_.cluster).toSet
      ids == (1 to ids.size).toSet
    }

  property("with reclaimBorder, the noise SET is visit-order independent") =
    forAll(genPoints, genEps, genMinPts, Gen.long) { (pts, eps, minPts, seed) =>
      def noiseSet(ps: IndexedSeq[Pt]): Set[Pt] =
        new LocalDBSCAN(eps, minPts, reclaimBorder = true).fit(ps)
          .filter(_.flag == Flag.Noise).map(lp => Pt(lp.x, lp.y)).toSet
      val shuffled = new scala.util.Random(seed).shuffle(pts)
      noiseSet(pts) == noiseSet(shuffled)
    }

  // ---- SpacePartitioner invariants ----

  private val cellSize = 1.0

  /** Random grid histogram: distinct unit cells with positive counts. */
  private val genCells: Gen[Set[(Rect, Int)]] = for {
    n <- Gen.chooseNum(1, 40)
    entries <- Gen.containerOfN[Set, (Int, Int)](n, for {
      i <- Gen.chooseNum(-8, 8)
      j <- Gen.chooseNum(-8, 8)
    } yield (i, j))
    counts <- Gen.containerOfN[List, Int](entries.size, Gen.chooseNum(1, 50))
  } yield entries.toList.zip(counts).map { case ((i, j), c) =>
    (Rect(i * cellSize, j * cellSize, (i + 1) * cellSize, (j + 1) * cellSize), c)
  }.toSet

  property("partitioner: every cell is covered by exactly one partition") =
    forAll(genCells, Gen.chooseNum(20L, 400L)) { (cells, maxPts) =>
      val parts = SpacePartitioner.partition(cells, maxPts, cellSize)
      cells.forall { case (cell, _) => parts.count(_._1.contains(cell)) == 1 }
    }

  property("partitioner: counts are exact per partition and total-preserving") =
    forAll(genCells, Gen.chooseNum(20L, 400L)) { (cells, maxPts) =>
      val parts = SpacePartitioner.partition(cells, maxPts, cellSize)
      // toList before summing: mapping a Set of (rect, count) down to the
      // counts would deduplicate equal counts
      val perPartOk = parts.forall { case (rect, count) =>
        count == cells.toList.filter(c => rect.contains(c._1)).map(_._2).sum
      }
      perPartOk && parts.map(_._2).sum == cells.toList.map(_._2).sum
    }

  property("partitioner: no partition over budget unless unsplittable") =
    forAll(genCells, Gen.chooseNum(20L, 400L)) { (cells, maxPts) =>
      SpacePartitioner.partition(cells, maxPts, cellSize).forall { case (rect, count) =>
        count <= maxPts || !SpacePartitioner.canBeSplit(rect, cellSize)
      }
    }

  // ---- GridSnap bounds ----

  property("grid snap: corner <= p < corner + 2*cell, cell-aligned") =
    forAll(Gen.chooseNum(-1000.0, 1000.0), Gen.chooseNum(0.1, 10.0)) { (p, cell) =>
      val c = GridSnap.corner(p, cell)
      val k = math.round(c / cell)
      c <= p && p < c + 2 * cell && math.abs(k * cell - c) < 1e-9
    }

  property("grid snap quirk: exact negative multiples land one cell lower") = {
    val cell = 0.5
    Prop.all((1 to 20).map { k =>
      val p = -k * cell
      Prop(GridSnap.corner(p, cell) == p - cell) :| s"p=$p"
    }: _*)
  }

  // ---- MinHash signature algebra ----

  private val P = 1000000007L
  private def sig(shingles: Seq[Long], k: Int): Seq[Long] = {
    val agg = new graft.functions.MinHashAgg(k, P)
    agg.finish(shingles.foldLeft(agg.zero)(agg.reduce))
  }

  property("minhash: signature of a union = element-wise min of signatures") =
    forAll(Gen.listOf(Gen.chooseNum(0L, P - 1)), Gen.listOf(Gen.chooseNum(0L, P - 1))) {
      (a, b) =>
        val agg = new graft.functions.MinHashAgg(8, P)
        val merged = agg.finish(agg.merge(
          a.foldLeft(agg.zero)(agg.reduce),
          b.foldLeft(agg.zero)(agg.reduce)))
        merged == sig(a ++ b, 8)
    }

  property("bloom filter: no false negatives, and parity with mightContain") =
    forAll(Gen.listOf(Gen.chooseNum(0L, 1000000L)), Gen.listOf(Gen.chooseNum(0L, 1000000L))) {
      (keys, probes) =>
        val agg = new graft.functions.BloomAgg(512, 3)
        val words = agg.finish(keys.foldLeft(agg.zero)(agg.reduce))
        val insertedAllHit = keys.forall(k =>
          graft.functions.BloomAgg.mightContain(words, 512, 3, k))
        // merged halves == single build (distributivity)
        val (ka, kb) = keys.splitAt(keys.length / 2)
        val merged = agg.merge(
          ka.foldLeft(agg.zero)(agg.reduce), kb.foldLeft(agg.zero)(agg.reduce))
        insertedAllHit && merged.sameElements(words) &&
          probes.forall(p => !keys.contains(p) ||
            graft.functions.BloomAgg.mightContain(words, 512, 3, p))
    }

  property("minhash: order and duplicate insensitive") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, P - 1)), Gen.long) { (a, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(a ++ a)
      sig(a, 8) == sig(shuffled, 8)
    }
}
