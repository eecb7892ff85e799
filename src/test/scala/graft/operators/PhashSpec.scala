package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Perceptual-hash contract: grid-size floor, determinism, robustness
  * to same-length perturbations (the property the banded near-dup
  * query banks on), and planted-pair recovery through the shared
  * 64-bit band join.
  */
class PhashSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("payloads under the 8x8 grid yield no hash; others are deterministic") {
    Multimodal.perceptualHash(bytes("short")) shouldBe None
    val p = bytes("a" * 40 + "b" * 40 + "c" * 40)
    Multimodal.perceptualHash(p) shouldBe Multimodal.perceptualHash(p)
    Multimodal.perceptualHash(p).isDefined shouldBe true
  }

  test("same-length perturbation moves few bits; different content moves many") {
    val base = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val h0 = Multimodal.perceptualHash(bytes(base)).get
    // flip the case of the first three characters (same length)
    val tweaked = base.take(3).toUpperCase + base.drop(3)
    val h1 = Multimodal.perceptualHash(bytes(tweaked)).get
    val other = ("zq wv jk lp qr st uv wx yz ab cd ef gh ij kl mn " * 4).trim
    val h2 = Multimodal.perceptualHash(bytes(other)).get
    java.lang.Long.bitCount(h0 ^ h1) should be <= 6
    java.lang.Long.bitCount(h0 ^ h2) should be > 6
  }

  test("planted same-length near-dups are recovered through the band join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val noisy = docs.select($"doc_id", $"text").unionByName(
      docs.select(($"doc_id" + 100000).as("doc_id"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.upper(
            org.apache.spark.sql.functions.substring($"text", 1, 3)),
          org.apache.spark.sql.functions.expr("substring(text, 4)")).as("text")))
    val pairs = Multimodal.phashNearPairs(noisy, "text", "doc_id", maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val planted = pairs.count { case (a, b) => b - a == 100000 }
    planted.toDouble / 500 should be > 0.9
    pairs.length should be < 5000 // banding keeps candidates sparse
  }
}
