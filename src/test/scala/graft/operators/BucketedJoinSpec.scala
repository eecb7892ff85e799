package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Co-located joins via bucketing: writing both sides bucketed+sorted
  * by the join key lets the sort-merge join read pre-shuffled data —
  * the physical plan has NO Exchange on either side. At 100 TB this is
  * the difference between joining in place and re-shuffling the fact
  * table on every query.
  */
class BucketedJoinSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse directories persist — clear them or the write errors
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (dir.exists()) rm(dir)
    }

    val orders = (0L until 1000L).map(i => (i, s"cust_${i % 97}")).toDF("o_orderkey", "cust")
    val lineitem = (0L until 5000L).map(i => (i % 1000L, i * 1.5)).toDF("l_orderkey", "amount")

    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // Disable auto-broadcast: the scenario is a big-big join where
    // broadcasting is impossible and bucketing is what saves the shuffle.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      plan should include("SortMergeJoin")
      plan should not include "Exchange" // co-located: no shuffle either side
      joined.count() shouldBe 5000L
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
