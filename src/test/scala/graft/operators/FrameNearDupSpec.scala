package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Frame-level near-dup over sampled block keys (m07): planted-copy
  * recall, overlap bounds, and the df-cap's pair-explosion guard.
  */
class FrameNearDupSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planted prefix copies pair with their source at high overlap") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(100)
    val noisy = docs.unionByName(
      docs.select(($"doc_id" + 100000).as("doc_id"),
        expr("substring(text, 1, greatest(cast(length(text) * 0.8 as int), 1))").as("text")))
    val pairs = Multimodal.frameNearPairs(noisy, "text", "doc_id",
        stride = 4, dfCap = 16, minOverlap = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // an 80%-byte-prefix copy shares every sampled frame key of its
    // prefix (blocks align from offset 0), so most planted pairs land
    val planted = pairs.filter { case (a, b, _) => b == a + 100000 }
    planted.length should be > 50
    pairs.foreach { case (_, _, ov) =>
      ov should be > 0.0
      ov should be <= 1.0
    }
  }

  test("df-cap drops corpus-frequent keys before the pair join") {
    // 20 identical payloads: every frame key has df=20 > dfCap=16, so
    // the posting join must produce ZERO candidate pairs (the cap is
    // what bounds a hot key's contribution at corpus scale)
    val same = (0 until 20)
      .map(i => (i.toLong, "identical payload body " * 10)).toDF("doc_id", "text")
    Multimodal.frameNearPairs(same, "text", "doc_id",
      stride = 4, dfCap = 16, minOverlap = 0.1).count() shouldBe 0L
    // raising the cap above the count restores the pairs
    Multimodal.frameNearPairs(same, "text", "doc_id",
      stride = 4, dfCap = 32, minOverlap = 0.9).count() shouldBe (20L * 19 / 2)
  }

  test("parameter guards") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Multimodal.frameNearPairs(docs, "text", "doc_id", stride = 0)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.frameNearPairs(docs, "text", "doc_id", minOverlap = 0.0)
  }
}
