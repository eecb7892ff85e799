package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Corpus novelty scoring (t28): exact behavior on a hand-computed
  * fixture, the planted-copy contrast, and the all-unique limit.
  */
class NoveltySpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed fixture: shared prefix dilutes novelty exactly") {
    // doc 1: "a b c d e" -> trigrams {abc, bcd, cde}
    // doc 2: "a b c x y" -> trigrams {abc, bcx, cxy}
    // abc has df=2; every other trigram df=1
    val docs = Seq((1L, "a b c d e"), (2L, "a b c x y")).toDF("doc_id", "text")
    val out = TextIndex.noveltyScores(docs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    out shouldBe Array(
      (1L, 3L, 2L, 0.666667),
      (2L, 3L, 2L, 0.666667))
  }

  test("planted prefix copies collapse to zero novelty; originals keep their tail") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(200)
    val noisy = docs.unionByName(
      docs.select(($"doc_id" + 100000).as("doc_id"),
        expr("""array_join(slice(split(trim(text), '\\s+'), 1,
               |  greatest(cast(floor(size(split(trim(text), '\\s+')) * 0.8) as int), 1)), ' ')"""
          .stripMargin).as("text")))
    val out = TextIndex.noveltyScores(noisy, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    val (copies, originals) = out.partition(_._1 >= 100000)
    // a prefix copy's trigrams are a subset of its source's -> df >= 2
    // for every one of them (novelty exactly 0 unless cross-doc
    // collisions add shingles, which only lowers df further)
    copies.count(_._2 == 0.0) should be >= (copies.length * 9 / 10)
    // sources keep their truncated tail as df==1 shingles
    val meanOrig = originals.map(_._2).sum / originals.length
    meanOrig should be > 0.05
    meanOrig should be < 1.0
  }

  test("an all-unique corpus scores novelty 1.0 everywhere") {
    val docs = (0 until 50)
      .map(i => (i.toLong, s"u${i}a u${i}b u${i}c u${i}d")).toDF("doc_id", "text")
    val out = TextIndex.noveltyScores(docs, "text", "doc_id", n = 3)
      .collect().map(r => r.getDouble(3))
    out.length shouldBe 50
    all(out) shouldBe 1.0
  }
}
