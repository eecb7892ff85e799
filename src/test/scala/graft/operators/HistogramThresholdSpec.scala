package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Histogram-quantile threshold contract: per stratum the kept set
  * covers at least the requested fraction, is minimal at bucket
  * granularity (dropping the threshold bucket would fall below the
  * target), and agrees with a driver-side recomputation.
  */
class HistogramThresholdSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kept fraction covers the target and is bucket-minimal") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Mixture.histogramThreshold(df, "source", "doc_id", "n_chars",
        bucketWidth = 16L, nBuckets = 256, topNum = 1L, topDen = 10L)
      .select("stratum", "bucket", "thr_bucket", "keep")
      .as[(String, Long, Long, Boolean)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      val total = rows.length
      val thr = rows.head._3
      rows.map(_._3).distinct should have size 1
      val kept = rows.count(_._4)
      // coverage: ceil(total/10) <= kept
      (kept * 10L) should be >= total.toLong
      // keep == (bucket >= thr) row by row
      rows.foreach { case (_, b, t, k) => k shouldBe (b >= t) }
      // minimality: strictly above the threshold bucket is NOT enough
      val above = rows.count(_._2 > thr)
      (above * 10L) should be < total.toLong
    }
  }

  test("driver recomputation of the per-stratum threshold agrees") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = df.selectExpr("source", "cast(doc_id as bigint)",
        "least(cast(n_chars as bigint) div 16, 255) as b")
      .as[(String, Long, Long)].collect()
    val expected = base.groupBy(_._1).map { case (src, rows) =>
      val hist = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val total = rows.size.toLong
      val thr = hist.keys.toSeq.sorted.reverse
        .scanLeft((Long.MaxValue, 0L)) { case ((_, cum), b) => (b, cum + hist(b)) }
        .drop(1)
        .filter { case (_, cum) => cum * 10 >= total }
        .map(_._1).max
      src -> thr
    }
    val got = Mixture.histogramThreshold(df, "source", "doc_id", "n_chars")
      .select("stratum", "thr_bucket").distinct()
      .as[(String, Long)].collect().toMap
    got shouldBe expected
  }
}
