package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Efraimidis–Spirakis weighted-sample contract: the integer key
  * replays on the driver, cardinality per stratum is exactly
  * min(k, |stratum|), the draw is deterministic, and weight bias is
  * visible — heavier rows are over-represented in the sample.
  */
class WeightedSampleSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Mod = 1000000007L
  private def sampleHash(id: Long): Long = {
    val i = Mixture.SampleI
    ((2L * i + 1) * (id % Mod) + i.toLong * i + 7L) % Mod
  }
  private def log2Fp(x: Long): Long = {
    val p = 63 - java.lang.Long.numberOfLeadingZeros(x)
    p * 65536L + (x * 65536L >> p) - 65536L
  }
  private def esKey(id: Long, w: Long): Long = {
    val u = sampleHash(id) % 65536L + 1L
    (1048576L - log2Fp(u)) * 1000000L / math.max(w, 1L)
  }

  test("key formula replays on the driver; exactly k rows per stratum") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Mixture.weightedSample(df, "source", "doc_id", "n_chars", k = 5)
      .orderBy("stratum", "rn")
      .select("stratum", "doc_id", "w", "es_key", "rn")
      .as[(String, Long, Long, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      rows.length shouldBe 5
      rows.map(_._5).sorted shouldBe (1L to 5L)
    }
    got.foreach { case (_, id, w, key, _) => key shouldBe esKey(id, w) }
  }

  test("deterministic across runs and caps at the stratum size") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run() = Mixture.weightedSample(df, "source", "doc_id", "n_chars", 50)
      .orderBy("stratum", "rn").collect().toSeq
    val a = run(); val b = run()
    a shouldBe b
    // sf0.001 strata have 25 docs each — k=50 keeps them all
    a.groupBy(_.getString(0)).values.foreach(_.size shouldBe 25)
  }

  test("selection is weight-biased") {
    // one stratum, weights 1..200: the sampled mean weight must exceed
    // the population mean (weighted draws favor heavy rows)
    val df = (1L to 200L).map(i => ("s", i, i)).toDF("src", "id", "w")
    val picked = Mixture.weightedSample(df, "src", "id", "w", k = 40)
      .select("w").as[Long].collect()
    val popMean = (1L to 200L).sum.toDouble / 200
    picked.sum.toDouble / picked.length should be > popMean
  }
}
