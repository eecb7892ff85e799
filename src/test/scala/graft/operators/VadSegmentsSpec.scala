package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** m08's run-structure kernel against a straightforward reference on
  * crafted and random payloads (empty / all-active / all-silent /
  * alternating), plus the integer-threshold boundary (sum == thr·len
  * is ACTIVE).
  */
class VadSegmentsSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(payloads: Seq[(Long, Array[Byte])], thr: Int)
      : Map[Long, (Int, Long, Long, Long)] = {
    val df = payloads.toDF("doc_id", "payload")
    Multimodal.vadSegments(spark, df, thr = thr).collect()
      .map(v => v.doc_id -> (v.n_blocks, v.n_active, v.n_segments, v.longest_run))
      .toMap
  }

  private def ref(p: Array[Byte], thr: Int): (Int, Long, Long, Long) = {
    val act = p.grouped(16).map(b => b.map(_ & 0xff).sum >= thr.toLong * b.length).toSeq
    val runs = act.foldLeft(List.empty[Long]) {
      case (h :: t, true) if h > 0 => (h + 1) :: t
      case (acc, true) => 1L :: acc
      case (acc, false) => 0L :: acc
    }.filter(_ > 0)
    (act.size, act.count(identity).toLong, runs.size.toLong,
      if (runs.isEmpty) 0L else runs.max)
  }

  test("crafted shapes: empty, all-active, all-silent, alternating, boundary") {
    val hi = Array.fill[Byte](16)(120.toByte)   // mean 120
    val lo = Array.fill[Byte](16)(10.toByte)    // mean 10
    val boundary = Array.fill[Byte](16)(100.toByte) // sum == thr*len exactly
    val payloads = Seq[(Long, Array[Byte])](
      (1L, Array.empty[Byte]),
      (2L, hi ++ hi ++ hi),
      (3L, lo ++ lo),
      (4L, hi ++ lo ++ hi ++ lo ++ hi),
      (5L, boundary))
    val got = run(payloads, 100)
    got(1L) shouldBe ((0, 0L, 0L, 0L))
    got(2L) shouldBe ((3, 3L, 1L, 3L))
    got(3L) shouldBe ((2, 0L, 0L, 0L))
    got(4L) shouldBe ((5, 3L, 3L, 1L))
    got(5L) shouldBe ((1, 1L, 1L, 1L)) // >= is inclusive at the boundary
    payloads.foreach { case (id, p) => got(id) shouldBe ref(p, 100) }
  }

  test("matches the reference fold on random payloads, ragged tails included") {
    val rnd = new scala.util.Random(3)
    val payloads = (1L to 30L).map { id =>
      val n = rnd.nextInt(200) + 1 // ragged final block almost surely
      (id, Array.fill[Byte](n)((rnd.nextInt(160) + 20).toByte))
    }
    val got = run(payloads, 95)
    payloads.foreach { case (id, p) => got(id) shouldBe ref(p, 95) }
  }
}
