package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Specs for the curation operators added in round 5: benchmark
  * decontamination, line-level boilerplate stats, and int8 embedding
  * quantization.
  */
class CurationOpsSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("contamination flags exactly the train docs sharing a shingle with eval") {
    // eval doc 1 = "a b c d"; train doc 10 shares shingle "a b c",
    // train doc 11 shares nothing, train doc 12 shares "b c d"
    // eval shingles: {a b c, b c d}; doc 10 shares {a b c}; doc 12's
    // distinct shingles {b c d, c d b, d b c} share {b c d}
    val evalDocs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "x y a b c z"),
      (11L, "p q r s t u"),
      (12L, "b c d b c d")).toDF("doc_id", "text")
    val got = Dedup.contamination(train, evalDocs, "text", "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    got shouldBe Array((10L, 1L, true), (11L, 0L, false), (12L, 1L, true))
  }

  test("contamination counts are distinct-shingle counts (within-doc repeats collapse)") {
    val evalDocs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // "a b c" appears twice in the train doc; counted once
    val train = Seq((10L, "a b c x a b c")).toDF("doc_id", "text")
    val got = Dedup.contamination(train, evalDocs, "text", "doc_id").collect()
    got.head.getLong(1) shouldBe 1L
  }

  test("lineDupStats marks cross-doc lines, not within-doc repeats") {
    val ten = (1 to 10).map("w" + _).mkString(" ")      // one full line
    val other = (11 to 20).map("w" + _).mkString(" ")
    // doc 1: [ten, other]; doc 2: [ten]; doc 3: [other2 unique]
    val docs = Seq(
      (1L, s"$ten $other"),
      (2L, ten),
      (3L, (21 to 30).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.lineDupStats(docs, "text", "doc_id").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    got shouldBe Array(
      (1L, 2L, 1L, 0.5), // "ten" shared with doc 2; "other" unique
      (2L, 1L, 1L, 1.0),
      (3L, 1L, 0L, 0.0))
  }

  test("lineDupStats: within-doc-only repeats have ndocs=1 and do not count") {
    val ten = (1 to 10).map("w" + _).mkString(" ")
    val docs = Seq((1L, s"$ten $ten")).toDF("doc_id", "text")
    val got = Dedup.lineDupStats(docs, "text", "doc_id").collect()
    got.head.getLong(2) shouldBe 0L // 2 lines, both the same, but 1 doc
  }

  test("int8Quantize: codes bounded, max element hits ±127, errors <= scale/2") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.27f, 0.1f, 0.0f)),
      (2L, Array(-2.0f, 1.0f, 0.25f, -0.125f))).toDF("vec_id", "embedding")
    val rows = Similarity.int8Quantize(vecs, "embedding", "vec_id")
      .orderBy("vec_id").collect()
    val codes1 = rows(0).getString(4).split(",").map(_.toInt)
    val codes2 = rows(1).getString(4).split(",").map(_.toInt)
    codes1.map(math.abs).max shouldBe 127 // the max-|x| element quantizes to ±127
    codes2.head shouldBe -127
    all(codes1.toSeq ++ codes2.toSeq) should (be >= -127 and be <= 127)
    rows.foreach { r =>
      val (scale, maxErr) = (r.getDouble(1), r.getDouble(2))
      maxErr should be <= scale / 2 + 1e-9 // round-to-nearest guarantee
      r.getDouble(3) should be <= maxErr   // mean <= max
    }
  }

  test("int8Quantize reconstruction is lossless for exactly-representable grids") {
    // elements are k * (1.27/127) = k * 0.01 exactly representable? No —
    // use a power-of-two grid: scale = 1.27/127 is not exact, so instead
    // check error shrinks vs a coarse 2-level quantization bound
    val v = Array.tabulate(8)(i => ((i % 5) - 2).toFloat / 2) // in [-1, 1]
    val rows = Similarity.int8Quantize(
      Seq((1L, v)).toDF("vec_id", "embedding"), "embedding", "vec_id").collect()
    rows.head.getDouble(2) should be < 0.01 // max_err far under element scale
  }

  test("int8Quantize: all-zero vector gives zero codes and zero error, no NaN") {
    val rows = Similarity.int8Quantize(
      Seq((1L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"),
      "embedding", "vec_id").collect()
    val r = rows.head
    r.getDouble(1) shouldBe 0.0 // scale
    r.getDouble(2) shouldBe 0.0 // max_err
    r.getDouble(3) shouldBe 0.0 // mean_err
    r.getString(4) shouldBe "0,0,0"
  }

  test("langGuess: null text pins to en") {
    val got = Seq((1L, null: String), (2L, "der hund ist und die"))
      .toDF("doc_id", "text")
      .select($"doc_id", graft.functions.TextAnalysis.langGuess($"text").as("lang"))
      .orderBy("doc_id").collect().map(_.getString(1))
    got shouldBe Array("en", "de")
  }

  test("tokenNgrams/modeCount: short docs yield empty arrays, repetition counts exact") {
    import graft.functions.TextAnalysis._
    val df = Seq(
      (1L, "a"),            // 1 token: no 2- or 3-grams
      (2L, "a b"),          // one bigram, no trigram
      (3L, "a b a b a"),    // bigrams: ab,ba,ab,ba -> mode 2; trigrams: aba,bab,aba -> dup 1
      (4L, "x x x x"))      // bigrams: xx*3 -> mode 3
      .toDF("doc_id", "text")
    // spark's size() is shadowed by Matchers' size(Long) — qualify
    val sz = org.apache.spark.sql.functions.size _
    val got = df.select($"doc_id",
        sz(tokenNgrams($"text", 2)).as("n2"),
        modeCount(tokenNgrams($"text", 2)).as("m2"),
        sz(tokenNgrams($"text", 3)).as("n3"),
        (sz(tokenNgrams($"text", 3)) - sz(array_distinct(tokenNgrams($"text", 3)))).as("d3"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    got shouldBe Array(
      (1L, 0, 0L, 0, 0),
      (2L, 1, 1L, 0, 0),
      (3L, 4, 2L, 3, 1),
      (4L, 3, 3L, 2, 1))
  }

  test("maxTokenFreq: mode count over tokens, 0 on empty") {
    import graft.functions.TextAnalysis._
    val got = Seq((1L, "a b a a"), (2L, ""), (3L, "x"))
      .toDF("doc_id", "text")
      .select($"doc_id", maxTokenFreq($"text").as("mf"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    // blank text tokenizes to [""] (one empty token) — mode 1, matching
    // the oracle's string_split_regex behavior
    got shouldBe Array(3L, 1L, 1L)
  }
}
