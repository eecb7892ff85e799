package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** DSIR importance-resampling contract: the per-document score replays
  * on the driver with the same integer fixed-point log2 arithmetic,
  * the keep verdict is the pure integer comparison, and steering
  * works — documents from the target sources score higher than the
  * rest on the real corpus.
  */
class DsirSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 1000000007L
  private def roll(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
  private def feats(text: String): Seq[Long] = {
    val toks = text.trim.split("\\s+").toSeq
    val all = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    all.map(f => ((roll(f) % 1024) + 1024) % 1024)
  }
  /** floor-linear 16.16 log2, the driver twin of Mixture.log2Fp */
  private def log2Fp(x: Long): Long = {
    val p = 63 - java.lang.Long.numberOfLeadingZeros(x)
    p * 65536L + (x * 65536L >> p) - 65536L
  }

  test("fixed-point log2 is exact at powers of two and monotone") {
    log2Fp(1L) shouldBe 0L
    log2Fp(2L) shouldBe 65536L
    log2Fp(1024L) shouldBe 10 * 65536L
    val xs = Seq(1L, 2L, 3L, 7L, 100L, 1023L, 1025L, 999999L, 1L << 40)
    xs.sliding(2).foreach { case Seq(a, b) =>
      log2Fp(a) should be < log2Fp(b)
    }
    // within 0.086 bits of true log2 everywhere
    xs.foreach { x =>
      math.abs(log2Fp(x) / 65536.0 - math.log(x.toDouble) / math.log(2.0)) should be < 0.09
    }
  }

  test("scores replay on the driver with exact integer arithmetic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Mixture.dsirImportance(docs, "doc_id", "text",
        $"source".isin("src0", "src1", "src2"), dim = 1024, thrFp = -170000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4))))
      .toMap
    val rows = docs.select($"doc_id".cast("long"), $"text",
        $"source".isin("src0", "src1", "src2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val perDoc = rows.map { case (id, text, t) => (id, feats(text), t) }
    val ctRaw = perDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctT = perDoc.filter(_._3).flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val lr = ctRaw.keys.map { b =>
      b -> (log2Fp(ctT.getOrElse(b, 0L) + 1) - log2Fp(ctRaw(b) + 1))
    }.toMap
    perDoc.foreach { case (id, fs, _) =>
      val lrSum = fs.map(lr).sum
      val (nf, ls, keep) = out(id)
      withClue(s"doc $id:") {
        nf shouldBe fs.size.toLong
        ls shouldBe lrSum
        keep shouldBe (lrSum >= -170000L * fs.size)
      }
    }
  }

  test("target-source documents score higher than the rest") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Mixture.dsirImportance(docs, "doc_id", "text",
        $"source".isin("src0", "src1", "src2"))
      .join(docs.select($"doc_id".cast("long").as("doc_id"), $"source"), "doc_id")
      .groupBy($"source".isin("src0", "src1", "src2").as("is_t"))
      .agg(avg($"importance").as("mean_imp"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    out(true) should be > out(false)
  }
}
