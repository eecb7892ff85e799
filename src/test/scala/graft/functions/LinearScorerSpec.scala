package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Hashed-ngram linear scorer contract (fastText model shape): the
  * feature list is unigrams then bigrams (2n-1 features for n tokens),
  * buckets land in [0, dim), and the weight sum replays exactly on the
  * driver with the same rolling-hash / Knuth-weight arithmetic.
  */
class LinearScorerSpec extends AnyFunSuite with Matchers {
  lazy val spark = graft.operators.TestSpark.spark
  import spark.implicits._

  private val P = 1000000007L
  private def roll(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
  private def weight(bucket: Long): Long =
    bucket * 2654435761L % 2000003L - 1000001L

  test("buckets are unigrams then bigrams, hashed into [0, dim)") {
    val df = Seq((1L, "the cat sat"), (2L, "solo")).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TextAnalysis.hashedNgramBuckets($"text", 1024).as("b")).collect()
    val byId = out.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    byId(1L) shouldBe Seq("the", "cat", "sat", "the cat", "cat sat")
      .map(f => ((roll(f) % 1024) + 1024) % 1024)
    byId(2L) shouldBe Seq(roll("solo") % 1024)
    byId.values.flatten.foreach { b => b should (be >= 0L and be < 1024L) }
  }

  test("weight sum and score replay on the driver") {
    val texts = Seq((1L, "a quick brown fox jumps"), (2L, "a a a a"), (3L, "x"))
    val out = texts.toDF("doc_id", "text")
      .select($"doc_id",
        aggregate(TextAnalysis.hashedNgramBuckets($"text", 1024), lit(0L),
          (acc, b) => acc + TextAnalysis.bucketWeight(b)).as("w_sum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      val toks = t.trim.split("\\s+").toSeq
      val feats = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val expect = feats.map(f => weight(((roll(f) % 1024) + 1024) % 1024)).sum
      withClue(s"doc $id:") { out(id) shouldBe expect }
    }
  }
}
