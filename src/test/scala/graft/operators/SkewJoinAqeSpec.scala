package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Measured comparison of the three skew strategies on the q24 shape
  * (3-hot-key join, broadcast disabled to force the shuffled big-big
  * case): unsalted SMJ, unsalted SMJ + AQE skew-join (thresholds tuned
  * down so the optimization can actually fire at test scale), and
  * explicit 8-way salting. Results must be identical; timings are
  * recorded in the test log so SkewJoin's guidance reflects
  * measurements, not folklore. Single-JVM timings are noisy — the spec
  * asserts correctness, not ranking.
  */
class SkewJoinAqeSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def agg(joined: DataFrame): Array[(String, Long, Double)] =
    joined.groupBy($"label")
      // decimal sum: double accumulation is order-dependent across plans
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("total"))
      .orderBy($"label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

  test("salted, plain, and AQE-skew joins agree; timings recorded") {
    val ev = graft.sources.Sources.events(spark, dir)
      .withColumn("hot_key", ($"user_id" % 3).cast("long"))
      .persist()
    ev.count() // materialize so every variant times the join, not the scan
    val dim = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")).toDF("hot_key", "label")

    def withConfs(confs: (String, String)*)(body: => Array[(String, Long, Double)]) = {
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val t0 = System.nanoTime()
        val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"

    val (plain, tPlain) = withConfs(noBroadcast,
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      agg(ev.join(dim, Seq("hot_key")))
    }
    val (aqeSkew, tAqe) = withConfs(noBroadcast,
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k") {
      agg(ev.join(dim, Seq("hot_key")))
    }
    val (salted, tSalted) = withConfs(noBroadcast) {
      agg(SkewJoin.salted(ev, dim, "hot_key", factor = 8, saltBy = $"event_id"))
    }
    ev.unpersist()

    info(f"q24 shape at sf0.01: plain SMJ $tPlain%.2fs, AQE skew-join $tAqe%.2fs, " +
      f"salted(8) $tSalted%.2fs")
    aqeSkew shouldBe plain
    salted shouldBe plain
    plain.map(_._1).toSeq shouldBe Seq("alpha", "beta", "gamma")
  }
}
