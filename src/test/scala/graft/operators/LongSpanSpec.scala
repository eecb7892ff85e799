package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract for [[Dedup.longSpanPairs]] (Lee et al. 2021 respelled as
  * window-hash postings): exact span arithmetic on hand-built docs —
  * a full copy spans the whole doc, a w-token overlap spans exactly w,
  * shorter overlaps never pair, and the df cap excludes boilerplate
  * windows instead of joining them quadratically.
  */
class LongSpanSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w = 4

  private def run(docs: Seq[(Long, String)], dfCap: Int = 1000) =
    Dedup.longSpanPairs(docs.toDF("doc_id", "text"), "text", "doc_id",
        windowTokens = w, dfCap = dfCap)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("full copy, partial span, and sub-window overlap") {
    val base = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10" // 10 tokens, 7 windows of 4
    val out = run(Seq(
      1L -> base,
      2L -> base,                         // full copy: run 7, span 10
      3L -> "x1 x2 a4 a5 a6 a7 x3 x4",    // shares exactly one 4-token window
      4L -> "y1 y2 a6 a7 a8 y3 y4"))      // 3-token overlap: below w, no pair
    out((1L, 2L)) shouldBe ((7L, 7L, 10L)) // n_shared, max_run, span = 7 + w - 1
    out((1L, 3L)) shouldBe ((1L, 1L, 4L))
    out((2L, 3L)) shouldBe ((1L, 1L, 4L))
    out.keySet shouldBe Set((1L, 2L), (1L, 3L), (2L, 3L)) // doc 4 never pairs
  }

  test("two disjoint shared spans stay separate runs; n_shared sums them") {
    // doc 6 shares tokens 1..5 (two windows) and 8..11 (one window) of
    // doc 5, with different gaps so the diagonals differ
    val out = run(Seq(
      5L -> "b1 b2 b3 b4 b5 q1 q2 b6 b7 b8 b9",
      6L -> "b1 b2 b3 b4 b5 z1 z2 z3 b6 b7 b8 b9"))
    // spans: 5-token prefix -> runs of 2 windows; 4-token suffix -> 1
    val (nShared, maxRun, span) = out((5L, 6L))
    nShared shouldBe 3L
    maxRun shouldBe 2L
    span shouldBe 5L
  }

  test("df cap excludes boilerplate windows (posting never explodes)") {
    val boiler = "c1 c2 c3 c4"
    val docs = (1L to 5L).map(i => i -> s"u$i v$i $boiler")
    run(docs).keySet should not be empty   // df 5 <= default cap: pairs
    run(docs, dfCap = 4) shouldBe empty    // df 5 > 4: excluded
  }

  test("docs shorter than the window never pair") {
    run(Seq(7L -> "s1 s2 s3", 8L -> "s1 s2 s3")) shouldBe empty
  }
}
