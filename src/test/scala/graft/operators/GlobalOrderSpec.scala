package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The two-pass distributed rank/ntile must be bit-identical to the
  * naive unpartitioned-window spelling over the same total order — that
  * equivalence is what lets the DuckDB oracle (plain `ntile(10)`) check
  * the scalable q34 plan. Plus a plan gate: the data-side window must
  * be partitioned (no Exchange SinglePartition over the ranked frame)
  * and no `ntile` window function may survive into the physical plan.
  */
class GlobalOrderSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def corpus(n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicate values on purpose: the id tiebreaker makes the order total
    (0 until n).map(i => (i.toLong, rnd.nextInt(40).toDouble)).toDF("id", "v")
  }

  test("globalRank == unpartitioned row_number, any partition count") {
    val df = corpus(300)
    val want = df.withColumn("rank",
        row_number().over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (nParts <- Seq(1, 4, 17)) {
      val got = GlobalOrder.globalRank(df, Seq(col("v").desc, col("id").asc), nParts)
        .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe want
    }
  }

  test("globalNtile == unpartitioned ntile: n<k, n%k!=0, n%k==0, k=1") {
    for ((n, k) <- Seq((7, 10), (303, 10), (300, 10), (300, 1), (100, 7))) {
      val df = corpus(n)
      val want = df.withColumn("tile",
          ntile(k).over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
        .select("id", "tile").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = GlobalOrder.globalNtile(df, Seq(col("v").desc, col("id").asc), k, 5)
        .select("id", "tile").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"n=$n k=$k: ") { got shouldBe want }
    }
  }

  test("globalRunningSum == unpartitioned cumulative sum, any partition count") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val df = (0 until 400)
      .map(i => (i.toLong, rnd.nextInt(20).toLong, if (rnd.nextBoolean()) 1L else -1L))
      .toDF("id", "t", "delta") // heavy t ties: the (t, delta desc, id) order is total
    val order = Seq(col("t").asc, col("delta").desc, col("id").asc)
    val want = df.withColumn("cum",
        sum(col("delta")).over(Window.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (nParts <- Seq(1, 4, 17)) {
      spark.catalog.clearCache() // each run owns its ranged persist
      val got = GlobalOrder.globalRunningSum(df, order, col("delta"), nParts = nParts)
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"nParts=$nParts: ") { got shouldBe want }
    }
  }

  test("q34 plan: range-partitioned, data window partitioned by __pid, no ntile") {
    val plan = graft.SparkEntry.queries("q34_decile_spend")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    plan should include("rangepartitioning")           // parallel range sort
    plan should not include "ntile("                   // replaced by arithmetic
    // the row_number over the data frame is partitioned by __pid — the
    // only unpartitioned window left is the ≤nParts-row counts prefix
    plan should include regex """row_number\(\) windowspecdefinition\(__pid#"""
  }
}
