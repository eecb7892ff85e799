package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LocalDBSCANNDSpec extends AnyFunSuite with Matchers {

  private def as2d(pts: Seq[Pt]): Vector[Array[Double]] =
    pts.map(p => Array(p.x, p.y)).toVector

  test("gridDims=2 on 2-D data reproduces LocalDBSCAN label-for-label (both border semantics)") {
    val pts = Golden.rows.map(_._1)
    for (reclaim <- Seq(false, true)) {
      val legacy = new LocalDBSCAN(0.3, 10, reclaim).fit(pts)
      val nd = new LocalDBSCANND(0.3, 10, reclaim, gridDims = 2).fit(as2d(pts))
      nd.length shouldBe legacy.length
      nd.zip(legacy).foreach { case (g, e) =>
        g.coords(0) shouldBe e.x
        g.coords(1) shouldBe e.y
        g.cluster shouldBe e.cluster
        g.flag shouldBe e.flag
      }
    }
  }

  test("golden fixture labels up to permutation (the n-D core is a DBSCAN)") {
    val labeled = new LocalDBSCANND(0.3, 10).fit(as2d(Golden.rows.map(_._1)))
    val got = labeled.map(lp => Pt(lp.coords(0), lp.coords(1)) -> lp.cluster).toMap
    Golden.matchesUpToPermutation(got) shouldBe Right(())
  }

  test("gridDims choice cannot change results (index is pruning only)") {
    val rnd = new scala.util.Random(3)
    val pts = Vector.fill(400)(Array.fill(4)(rnd.nextDouble()))
    val base = new LocalDBSCANND(0.15, 5, reclaimBorder = true, gridDims = 2).fit(pts)
    for (k <- Seq(1, 3, 4)) {
      val alt = new LocalDBSCANND(0.15, 5, reclaimBorder = true, gridDims = k).fit(pts)
      // same core set, same noise set, same cluster partition over cores
      def coreSets(r: IndexedSeq[LabeledPtN]) = r.zipWithIndex
        .filter(_._1.flag == Flag.Core).groupBy(_._1.cluster)
        .values.map(_.map(_._2).toSet).toSet
      alt.map(_.flag) shouldBe base.map(_.flag)
      coreSets(alt) shouldBe coreSets(base)
    }
  }

  test("4-D clusters separated in a dimension the grid does not index") {
    // two tight groups identical in dims 0-1, separated only in dim 3:
    // the 2-dim grid puts them in the same cells; the full-D distance
    // check must still split them
    val a = (0 until 6).map(i => Array(0.0, 0.0, 0.0, 0.001 * i))
    val b = (0 until 6).map(i => Array(0.0, 0.0, 0.0, 5.0 + 0.001 * i))
    val got = new LocalDBSCANND(0.1, 4).fit((a ++ b).toVector)
    val clusters = got.map(_.cluster).distinct.filter(_ != 0)
    clusters should have size 2
    got.take(6).map(_.cluster).distinct should have size 1
    got.drop(6).map(_.cluster).distinct should have size 1
    got.take(6).head.cluster should not be got.drop(6).head.cluster
    all(got.map(_.flag)) shouldBe Flag.Core
  }

  test("empty and degenerate inputs") {
    new LocalDBSCANND(0.3, 10).fit(Vector.empty) shouldBe empty
    val one = new LocalDBSCANND(0.3, 10).fit(Vector(Array(1.0, 2.0, 3.0)))
    one.head.flag shouldBe Flag.Noise
    one.head.cluster shouldBe 0
  }
}
