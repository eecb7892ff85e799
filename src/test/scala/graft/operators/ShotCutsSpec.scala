package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** m09's shot-boundary kernel against a straightforward reference on
  * crafted and random payloads: empty / single-frame / uniform (no
  * cuts) / hard alternation (every transition cuts), plus the
  * strict-inequality boundary (jump == thr is NOT a cut) and ragged
  * final frames.
  */
class ShotCutsSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(payloads: Seq[(Long, Array[Byte])], thr: Long)
      : Map[Long, (Long, Long, Long, Long)] = {
    val df = payloads.toDF("doc_id", "payload")
    Multimodal.shotCuts(spark, df, thr = thr).collect()
      .map(v => v.doc_id -> (v.n_frames, v.n_cuts, v.n_shots, v.max_jump))
      .toMap
  }

  private def ref(p: Array[Byte], thr: Long): (Long, Long, Long, Long) = {
    val sigs = p.grouped(16).map(_.map(_ & 0xff).map(_.toLong).sum).toSeq
    val jumps = sigs.zip(sigs.drop(1)).map { case (a, b) => math.abs(b - a) }
    (sigs.size.toLong, jumps.count(_ > thr).toLong,
      if (sigs.nonEmpty) jumps.count(_ > thr).toLong + 1 else 0L,
      if (jumps.isEmpty) 0L else jumps.max)
  }

  test("crafted shapes: empty, one frame, uniform, alternation, boundary jump") {
    val hi = Array.fill[Byte](16)(120.toByte) // sig 1920
    val lo = Array.fill[Byte](16)(10.toByte)  // sig 160
    // sig jump exactly thr: 16 bytes at 100 vs 16 at 106 -> |1696-1600|=96
    val a = Array.fill[Byte](16)(100.toByte)
    val b = Array.fill[Byte](16)(106.toByte)
    val payloads = Seq[(Long, Array[Byte])](
      (1L, Array.empty[Byte]),
      (2L, hi),                       // single frame: 1 shot, 0 cuts
      (3L, hi ++ hi ++ hi),           // uniform: 0 cuts
      (4L, hi ++ lo ++ hi ++ lo),     // every transition cuts
      (5L, a ++ b))                   // jump == thr: NOT a cut
    val got = run(payloads, 96L)
    got(1L) shouldBe ((0L, 0L, 0L, 0L))
    got(2L) shouldBe ((1L, 0L, 1L, 0L))
    got(3L) shouldBe ((3L, 0L, 1L, 0L))
    got(4L) shouldBe ((4L, 3L, 4L, 1760L))
    got(5L) shouldBe ((2L, 0L, 1L, 96L))
    payloads.foreach { case (id, p) => got(id) shouldBe ref(p, 96L) }
  }

  test("matches the reference fold on random ragged payloads") {
    val rnd = new scala.util.Random(17)
    val payloads = (1L to 30L).map { id =>
      val n = rnd.nextInt(300) + 1
      (id, Array.fill[Byte](n)((rnd.nextInt(200) + 20).toByte))
    }
    val got = run(payloads, 96L)
    payloads.foreach { case (id, p) => got(id) shouldBe ref(p, 96L) }
  }
}
