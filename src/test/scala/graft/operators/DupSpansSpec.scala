package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract for [[Dedup.dupSpans]] (the exact-substring REMOVAL
  * artifact of Lee et al. 2021): maximal islands over duplicated
  * window starts, the distinct-doc rule (within-doc repeats alone
  * never mark a span — that exposure is the Gopher rule's job), and
  * the adjacency convention (windows [p, p+w-1] and [p+w, ...] cover
  * a contiguous token range, so they merge into one span).
  */
class DupSpansSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w = 4

  private def run(docs: Seq[(Long, String)]) =
    Dedup.dupSpans(docs.toDF("doc_id", "text"), "text", "doc_id",
        windowTokens = w)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toList).toMap

  test("full copy marks the whole doc as one maximal span on both sides") {
    val base = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10" // 10 tokens
    val out = run(Seq(1L -> base, 2L -> base))
    out(1L) shouldBe List((1, 10, 10))
    out(2L) shouldBe List((1, 10, 10))
  }

  test("two disjoint shared regions yield two maximal spans per doc") {
    // shared 5-token prefix (windows 1..2) and 4-token suffix (one
    // window), separated by different fillers so the regions can't
    // bridge: spans stay separate on both docs, at their own offsets
    val out = run(Seq(
      5L -> "b1 b2 b3 b4 b5 q1 q2 b6 b7 b8 b9",
      6L -> "b1 b2 b3 b4 b5 z1 z2 z3 b6 b7 b8 b9"))
    out(5L) shouldBe List((1, 5, 5), (8, 11, 4))
    out(6L) shouldBe List((1, 5, 5), (9, 12, 4))
  }

  test("within-doc-only repetition never marks (distinct-doc rule)") {
    run(Seq(9L -> "r1 r2 r3 r4 x1 r1 r2 r3 r4")) shouldBe empty
  }

  test("adjacent windows merge: a 2w-token copy is ONE span") {
    // doc 7 embeds an 8-token copy of doc 8; its 5 window starts are
    // consecutive-and-adjacent and must merge into one maximal span
    val out = run(Seq(
      7L -> "p1 c1 c2 c3 c4 c5 c6 c7 c8 p2",
      8L -> "c1 c2 c3 c4 c5 c6 c7 c8"))
    out(7L) shouldBe List((2, 9, 8))
    out(8L) shouldBe List((1, 8, 8))
  }

  test("docs shorter than the window emit nothing") {
    run(Seq(10L -> "s1 s2 s3", 11L -> "s1 s2 s3")) shouldBe empty
  }
}
