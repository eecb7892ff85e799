package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.TextKernels

/** Trained BPE tokenizer: kernel semantics, replayability, and the
  * distributed apply's invariants on the real testdata.
  */
class BpeSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("textbook fixture learns the known merge sequence") {
    // the classic BPE walkthrough corpus: pair (u,g) dominates at 20,
    // then (u,n) at 16, then (h,ug) at 15
    val freq = Seq("hug" -> 10L, "pug" -> 5L, "pun" -> 12L,
      "bun" -> 4L, "hugs" -> 5L)
    val merges = TextKernels.bpeTrainMerges(freq, 3)
    merges.toSeq shouldBe Seq(("u", "g"), ("u", "n"), ("h", "ug"))
  }

  test("training stops when no pair repeats; ties break lexicographically") {
    TextKernels.bpeTrainMerges(Seq("ab" -> 1L), 10).length shouldBe 0
    // xy and yz both occur twice (in distinct words, freq 2 each):
    // the lexicographically smaller pair must win the tie
    val m = TextKernels.bpeTrainMerges(Seq("xy" -> 2L, "yz" -> 2L), 1)
    m.head shouldBe ("x", "y")
  }

  test("segment invariants: concatenation, zero merges, monotone counts") {
    val freq = Seq("lowest" -> 5L, "low" -> 7L, "newest" -> 6L, "new" -> 4L)
    val allMerges = TextKernels.bpeTrainMerges(freq, 20)
    val words = Seq("lowest", "newest", "low", "slowest", "unknown", "")
    (0 to allMerges.length).foreach { k =>
      val ranks = allMerges.take(k).zipWithIndex.map { case (p, i) => (p, i) }.toMap
      words.foreach { w =>
        val seg = TextKernels.bpeSegment(w, ranks)
        seg.mkString shouldBe w
        if (k == 0) seg.length shouldBe w.length
      }
    }
    // token count never increases as the merge table grows
    words.filter(_.nonEmpty).foreach { w =>
      val counts = (0 to allMerges.length).map { k =>
        val ranks = allMerges.take(k).zipWithIndex.map { case (p, i) => (p, i) }.toMap
        TextKernels.bpeSegment(w, ranks).length
      }
      counts.zip(counts.tail).foreach { case (a, b) => b should be <= a }
    }
  }

  test("training on the real corpus is bit-replayable") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m1 = BpeTokenizer.trainMergesLocal(docs, "text", "doc_id",
      nMerges = 50, sampleN = 256, maxWords = 1024)
    val m2 = BpeTokenizer.trainMergesLocal(docs, "text", "doc_id",
      nMerges = 50, sampleN = 256, maxWords = 1024)
    m1.toSeq shouldBe m2.toSeq
    m1.length shouldBe 50 // real text has plenty of repeating pairs
  }

  test("distributed apply: per-doc bounds and compression on real data") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = BpeTokenizer.trainMergesLocal(docs, "text", "doc_id",
      nMerges = 100, sampleN = 256, maxWords = 1024)
    val out = BpeTokenizer.tokenCounts(docs, merges, "text", "doc_id").persist()
    out.count() shouldBe docs.count()
    // a word is at least one token; a token is at least one symbol
    out.filter(col("n_bpe") < col("n_words") ||
      col("n_bpe") > col("n_sym")).count() shouldBe 0L
    // the learned merges actually compress: corpus-wide bpe tokens are
    // strictly fewer than raw symbols
    val agg = out.agg(sum("n_sym"), sum("n_bpe")).head()
    agg.getLong(1) should be < agg.getLong(0)
    out.unpersist()
  }
}
