package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** AsOfJoin.latestBefore vs the naive join+argmax definition, on random
  * data with deliberate timestamp collisions (the tie cases: equal left
  * and right times must NOT match — strict —, equal right times break
  * by max ord).
  */
class AsOfJoinSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("merge as-of equals brute-force latest-strictly-before with tie-breaks") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small time domain forces collisions within and across sides
    val left = (0 until 400).map(i => (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(40).toLong))
    val right = (0 until 400).map(i =>
      (i.toLong + 1000, rnd.nextInt(10).toLong, rnd.nextInt(40).toLong))
    val lDF = left.toDF("lid", "k", "lt")
    val rDF = right.toDF("rid", "k", "rt")

    val got = AsOfJoin.latestBefore(lDF, rDF,
        key = "k", leftTime = "lt", rightTime = "rt",
        payload = struct($"rid", $"rt"), ord = $"rid")
      .select($"lid", $"asof.rid".as("prev"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    val expected = left.map { case (lid, k, lt) =>
      val candidates = right.filter(r => r._2 == k && r._3 < lt)
      val best = if (candidates.isEmpty) -1L
        else candidates.maxBy(r => (r._3, r._1))._1
      lid -> best
    }.toMap

    got shouldBe expected
  }

  test("null keys, null times, and null payloads follow join semantics") {
    import spark.implicits._
    val lDF = Seq((1L, Some(1L), 10L), (2L, None: Option[Long], 10L))
      .toDF("lid", "k", "lt")
    val rDF = Seq(
      (Some(1L), Some(3L), Some(7L)), // the true latest-before, null payload below
      (Some(1L), Some(5L), None), // later, NULL payload — must still win
      (Some(1L), None, Some(9L)), // null time: never matches
      (None, Some(4L), Some(8L))) // null key: never matches
      .toDF("k", "rt", "payload")
    val got = AsOfJoin.latestBefore(lDF, rDF, "k", "lt", "rt",
        payload = $"payload", ord = coalesce($"payload", lit(0L)))
      .select($"lid", $"asof").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // lid=1: the latest right strictly before lt=10 is (rt=5, payload
    // NULL) — the match's null payload must come through, NOT the stale
    // rt=3 row's 7, and the null-time row's 9 must never appear
    got(1L) shouldBe None
    // lid=2 has a null key: no match (null keys never join)
    got(2L) shouldBe None
  }

  test("no prior right rows yields null asof") {
    import spark.implicits._
    val lDF = Seq((1L, 1L, 5L)).toDF("lid", "k", "lt")
    val rDF = Seq((9L, 1L, 5L), (10L, 1L, 7L), (11L, 2L, 1L)).toDF("rid", "k", "rt")
    val row = AsOfJoin.latestBefore(lDF, rDF, "k", "lt", "rt",
      struct($"rid"), $"rid").select($"asof").head()
    row.isNullAt(0) shouldBe true // same-time right excluded (strict), other key invisible
  }
}
