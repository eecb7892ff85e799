package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** RAG-style overlapping-window chunking (t27): exact chunk-count
  * arithmetic, full coverage, and driver-side replay parity on the
  * real documents table.
  */
class ChunkOverlapSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDoc(id: Long, n: Int): (Long, String) =
    (id, (0 until n).map(i => s"w$i").mkString(" "))

  test("chunk count and boundaries are exact for edge sizes") {
    // sizes straddling every boundary: < C, = C, C+1, exactly one
    // stride past, many strides, and a final short window
    val docs = Seq(mkDoc(0, 1), mkDoc(1, 63), mkDoc(2, 64), mkDoc(3, 65),
      mkDoc(4, 112), mkDoc(5, 113), mkDoc(6, 300)).toDF("doc_id", "text")
    val out = Mixture.chunkOverlap(docs, chunkTok = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    def nChunks(n: Int) = if (n <= 64) 1 else ((n - 64 + 47) / 48) + 1
    for ((id, n) <- Seq(0 -> 1, 1 -> 63, 2 -> 64, 3 -> 65, 4 -> 112, 5 -> 113, 6 -> 300)) {
      val chunks = out(id.toLong).sortBy(_._2)
      chunks.length shouldBe nChunks(n)
      // starts advance by the stride; every chunk is non-empty;
      // the union of [start, start+len) covers [0, n) with no gap
      chunks.zipWithIndex.foreach { case ((_, ci, start, len), i) =>
        ci shouldBe i.toLong
        start shouldBe i * 48L
        len should be > 0L
        len should be <= 64L
      }
      val last = chunks.last
      (last._3 + last._4) shouldBe n.toLong // final chunk ends at n_tok
      // gapless: each next start is within the previous chunk's span
      chunks.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) => s2 should be <= (s1 + l1)
        case _ =>
      }
    }
  }

  test("replay parity on the real documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val P = 1000000007L
    def roll(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
    val expected = docs.select($"doc_id", $"text").collect().flatMap { r =>
      val id = r.getLong(0)
      val toks = r.getString(1).trim.split("\\s+")
      val n = toks.length
      val nc = if (n <= 64) 1 else ((n - 64 + 47) / 48) + 1
      (0 until nc).map { ci =>
        val chunk = toks.slice(ci * 48, ci * 48 + 64)
        (id, ci.toLong, ci * 48L, chunk.length.toLong, roll(chunk.mkString(" ")))
      }
    }.sortBy(t => (t._1, t._2))
    val got = Mixture.chunkOverlap(docs, chunkTok = 64, stride = 48)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    got.toSeq shouldBe expected.toSeq
  }

  test("parameter guard: stride must not exceed chunk size") {
    val docs = Seq(mkDoc(0, 10)).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Mixture.chunkOverlap(docs, chunkTok = 8, stride = 9)
  }
}
