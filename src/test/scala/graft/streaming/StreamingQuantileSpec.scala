package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TestSpark

/** The streaming GK quantile sketch honors its rank-error guarantee
  * against the batch exact distribution of the same data: for every
  * (event_type, frac) the streaming estimate's rank interval
  * [count(v < est), count(v <= est)], grown by n/accuracy + 1, must
  * contain the target rank frac*n. This is q45's oracle-checked bound,
  * applied to the stream path whose merge order a SQL oracle cannot
  * replay.
  */
class StreamingQuantileSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("streaming percentile_approx estimates are within the rank bound of batch exact") {
    val dir = "/root/testdata/sf0.001"
    val est = Streaming.streamQuantiles(spark, dir)
      .select(col("event_type"), col("frac"), col("est_v"), col("n"))
      .collect()
    est.length shouldBe 15 // 5 event types x 3 fracs
    val vals = graft.sources.Sources.events(spark, dir)
      .select(col("event_type"), expr("cast(value as bigint)").as("v"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1).toDouble).sorted).toMap
    est.foreach { r =>
      val (et, frac, ev, n) =
        (r.getString(0), r.getDouble(1), r.getLong(2).toDouble, r.getLong(3))
      val vs = vals(et)
      vs.length.toLong shouldBe n
      val lt = vs.count(_ < ev).toDouble
      val le = vs.count(_ <= ev).toDouble
      val bound = n / 1000.0 + 1
      val target = frac * n
      withClue(s"$et frac=$frac est=$ev lt=$lt le=$le target=$target: ") {
        (lt - bound) should be <= target
        (le + bound) should be >= target
      }
    }
  }
}
