package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Hashed-bigram LM perplexity contract: the per-document surprisal
  * replays on the driver with the same integer fixed-point arithmetic,
  * the keep verdict is the floor-mean comparison against the corpus
  * mean, and the relative bar actually splits the real corpus.
  */
class LmPerplexitySpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 1000000007L
  private val CtxDim = 64
  private val BiDim = 512
  private def roll(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
  private def log2Fp(x: Long): Long = {
    val p = 63 - java.lang.Long.numberOfLeadingZeros(x)
    p * 65536L + (x * 65536L >> p) - 65536L
  }
  private def pairs(text: String): Seq[(Long, Long)] =
    text.trim.split("\\s+").toSeq.sliding(2).filter(_.size == 2).map { w =>
      (roll(w.head) % CtxDim, roll(w.mkString(" ")) % BiDim)
    }.toSeq

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the hat"),
    (3L, "the dog ran in the park"),
    (4L, "zyx qwv jkl pqr stu vwx"), // all-rare bigrams: gibberish
    (5L, "the cat sat on the mat again"))

  test("per-doc surprisal and keep replay exactly on the driver") {
    val df = docs.toDF("doc_id", "text")
    val got = Mixture.lmPerplexity(df, "doc_id", "text", CtxDim, BiDim)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "bits_sum", "corpus_mean_fp", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect()

    val all = docs.flatMap { case (_, t) => pairs(t) }
    val ctxCt = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val biCt = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val perDoc = docs.map { case (id, t) =>
      val ps = pairs(t)
      val bits = ps.map { case (c, b) =>
        log2Fp(ctxCt(c) + BiDim) - log2Fp(biCt(b) + 1)
      }.sum
      (id, ps.size.toLong, bits)
    }
    val totBits = perDoc.map(_._3).sum
    val totN = perDoc.map(_._2).sum
    val mean = totBits / totN // all non-negative: floor == truncate

    got.map(_._1) shouldBe perDoc.map(_._1)
    got.foreach { case (id, n, bits, meanFp, keep) =>
      val (_, en, ebits) = perDoc.find(_._1 == id).get
      n shouldBe en
      bits shouldBe ebits
      meanFp shouldBe mean
      keep shouldBe (bits / n <= mean)
    }
    // the gibberish doc is more surprising than the fluent repeat and
    // lands on the not-kept side of the corpus-mean bar
    val byMean = got.map(t => (t._1, t._3.toDouble / t._2)).toMap
    byMean(4L) should be > byMean(1L)
    got.find(_._1 == 4L).get._5 shouldBe false
    // a repeated fluent doc is kept
    got.find(_._1 == 1L).get._5 shouldBe true
  }

  test("relative bar splits the real corpus at any scale") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val keeps = Mixture.lmPerplexity(df, "doc_id", "text")
      .groupBy("keep").count().as[(Boolean, Long)].collect().toMap
    keeps.keySet shouldBe Set(true, false)
    // corpus-mean bar: neither side can collapse to near-nothing
    val tot = keeps.values.sum
    keeps(true).toDouble / tot should be > 0.2
    keeps(false).toDouble / tot should be > 0.2
  }

  test("model counts are dim-bounded") {
    val df = docs.toDF("doc_id", "text")
    val counts = Mixture.lmBigramCounts(df, "text", CtxDim, BiDim).collect()
    counts.length should be <= (CtxDim + BiDim)
    counts.foreach { r =>
      val kind = r.getInt(0)
      val bucket = r.getLong(1)
      kind match {
        case 0 => bucket should (be >= 0L and be < CtxDim.toLong)
        case 1 => bucket should (be >= 0L and be < BiDim.toLong)
      }
    }
  }
}
