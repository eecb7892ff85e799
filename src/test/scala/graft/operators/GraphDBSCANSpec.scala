package graft.operators

import graft.core.{Flag, LocalDBSCANND}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraphDBSCANSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distributed euclidean n-D DBSCAN agrees with the local n-D core") {
    val rnd = new scala.util.Random(17)
    val pts = Vector.fill(500)(Array.fill(4)(rnd.nextDouble()))
    val eps = 0.2
    val minPts = 5

    val local = new LocalDBSCANND(eps, minPts, reclaimBorder = true).fit(pts)

    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "v")
    val dist = GraphDBSCAN.euclidean(df, eps, minPts, idCol = "vec_id", vecCol = "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)

    // flags agree point-for-point (standard-DBSCAN core/border/noise
    // sets are visit-order independent)
    dist.map(_._3).toSeq shouldBe local.map(_.flag)

    // cluster partition over CORE points agrees (border attachment may
    // legally differ between formulations when a border point touches
    // two clusters)
    def partition(assign: Seq[(Int, Long)]): Set[Set[Int]] =
      assign.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    val localCores = local.zipWithIndex.collect {
      case (lp, i) if lp.flag == Flag.Core => (i, lp.cluster.toLong)
    }
    val distCores = dist.zipWithIndex.collect {
      case ((_, rep, f), i) if f == Flag.Core => (i, rep)
    }
    partition(distCores.toSeq) shouldBe partition(localCores.toSeq)

    // sanity: the parameters produce a non-trivial mix
    dist.count(_._3 == Flag.Core) should be > 50
    dist.count(_._3 == Flag.Noise) should be > 5
  }

  test("euclidean neighbor graph misses nothing the exact join finds") {
    val rnd = new scala.util.Random(23)
    val pts = Vector.fill(200)(Array.fill(3)(rnd.nextDouble() * 2))
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "v")
    val eps = 0.25
    // exact all-pairs neighbor count per point
    val exact = df.as("a").join(df.as("b"),
        col("a.vec_id") =!= col("b.vec_id") &&
          GraphDBSCAN.distSq(col("a.v"), col("b.v")) <= lit(eps * eps))
      .groupBy(col("a.vec_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // grid path: labels with minPts k means degree >= k-1; compare via
    // the core sets across several thresholds
    for (minPts <- Seq(2, 4, 6)) {
      val grid = GraphDBSCAN.euclidean(df, eps, minPts, idCol = "vec_id", vecCol = "v")
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      (0L until 200L).foreach { i =>
        val isCore = exact.getOrElse(i, 0L) + 1 >= minPts
        (grid(i) == Flag.Core) shouldBe isCore
      }
    }
  }
}
