package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** Skyline against the brute-force dominance definition, plus the two
  * properties the distributed design leans on: partitioning invariance
  * (local pruning removes only globally-dominated rows) and duplicate
  * handling (copies of an undominated point all survive).
  */
class SkylineSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(rows: Seq[(Long, Double, Long)]): Set[(Long, Double, Long)] =
    rows.filter { r =>
      !rows.exists(s => s._2 >= r._2 && s._3 <= r._3 &&
        (s._2 > r._2 || s._3 < r._3))
    }.toSet

  private def run(rows: Seq[(Long, Double, Long)], parts: Int): Set[(Long, Double, Long)] = {
    val df = spark.createDataset(rows).toDF("k", "mx", "mn").repartition(parts)
    Skyline.skyline2D(spark, df, "k", "mx", "mn")
      .as[(Long, Double, Long)].collect().toSet
  }

  test("matches brute-force dominance on random data, any partitioning") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 50 + trial * 70
      val rows = (1 to n).map(i =>
        (i.toLong, (rnd.nextInt(40) * 25).toDouble, rnd.nextInt(40).toLong))
      val expect = brute(rows)
      for (parts <- Seq(1, 3, 16)) {
        run(rows, parts) shouldBe expect
      }
    }
  }

  test("duplicates of an undominated point all survive; dominated ties die") {
    val rows = Seq(
      (1L, 100.0, 5L), (2L, 100.0, 5L), // duplicate skyline point: both live
      (3L, 100.0, 7L),                  // same price, later day: dominated
      (4L, 90.0, 5L),                   // same day, lower price: dominated
      (5L, 120.0, 9L),                  // higher price, later day: undominated
      (6L, 80.0, 2L))                   // lower price, earlier day: undominated
    run(rows, 4) shouldBe Set((1L, 100.0, 5L), (2L, 100.0, 5L),
      (5L, 120.0, 9L), (6L, 80.0, 2L))
    run(rows, 4) shouldBe brute(rows)
  }

  test("degenerate inputs: empty, single row, all-identical") {
    run(Nil, 2) shouldBe Set.empty
    run(Seq((1L, 5.0, 5L)), 2) shouldBe Set((1L, 5.0, 5L))
    val same = (1L to 20L).map(i => (i, 3.0, 3L))
    run(same, 5) shouldBe same.toSet // no strict improvement anywhere
  }

  test("totally-ordered chain collapses to its best point") {
    // price rises as day falls: every row dominates the previous one
    val chain = (1L to 30L).map(i => (i, i * 10.0, 100L - i))
    run(chain, 6) shouldBe Set((30L, 300.0, 70L))
  }

  // ---------- 3-D dominance-buffer engine ----------

  private def brute3(rows: Seq[(Long, Double, Long, String)]): Set[(Long, Double, Long, String)] =
    rows.filter { r =>
      !rows.exists(s => s._2 >= r._2 && s._3 <= r._3 && s._4 <= r._4 &&
        (s._2 > r._2 || s._3 < r._3 || s._4 < r._4))
    }.toSet

  private def run3(rows: Seq[(Long, Double, Long, String)], parts: Int)
      : Set[(Long, Double, Long, String)] = {
    val df = spark.createDataset(rows).toDF("k", "mx", "mn", "ms").repartition(parts)
    Skyline.skyline3D(spark, df, "k", "mx", "mn", "ms")
      .as[(Long, Double, Long, String)].collect().toSet
  }

  test("3-D matches brute force on tie-heavy random data, any partitioning") {
    val rnd = new Random(13)
    val prios = Array("1-URGENT", "2-HIGH", "3-MEDIUM")
    for (trial <- 1 to 4) {
      val rows = (1 to 80 + trial * 60).map(i =>
        (i.toLong, (rnd.nextInt(12) * 50).toDouble, rnd.nextInt(12).toLong,
          prios(rnd.nextInt(3))))
      val expect = brute3(rows)
      for (parts <- Seq(1, 4, 16)) run3(rows, parts) shouldBe expect
    }
  }

  test("3-D: a point dominated only through the string dim dies; incomparables live") {
    val rows = Seq(
      (1L, 100.0, 5L, "1-URGENT"),
      (2L, 100.0, 5L, "2-HIGH"),   // dominated by 1 via the string dim
      (3L, 100.0, 4L, "3-MEDIUM"), // incomparable to 1 (better day, worse prio)
      (4L, 120.0, 9L, "3-MEDIUM")) // incomparable (better price, worse day)
    run3(rows, 3) shouldBe Set((1L, 100.0, 5L, "1-URGENT"),
      (3L, 100.0, 4L, "3-MEDIUM"), (4L, 120.0, 9L, "3-MEDIUM"))
    run3(rows, 3) shouldBe brute3(rows)
  }
}
