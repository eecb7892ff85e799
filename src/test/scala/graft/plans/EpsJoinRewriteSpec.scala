package graft.plans

import graft.functions.Geo
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EpsJoinRewriteSpec extends AnyFunSuite with Matchers {

  // Shared test session (has GraftExtensions installed).
  private lazy val spark: SparkSession = graft.operators.TestSpark.spark

  private def points(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map(i =>
      (i.toLong, rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10))
    spark.createDataFrame(rows).toDF("id", "x", "y")
  }

  test("theta eps join is rewritten to a hash join and matches brute force") {
    val a = points(1, 300)
    val b = points(2, 300)
    val eps = 1.5
    val joined = a.as("a").join(b.as("b"),
      Geo.distSq(col("a.x"), col("a.y"), col("b.x"), col("b.y")) <= eps * eps)

    val phys = joined.queryExecution.executedPlan.toString
    phys should not include "BroadcastNestedLoopJoin"
    phys should not include "CartesianProduct"

    val got = joined.select(col("a.id").as("ida"), col("b.id").as("idb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val av = a.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val bv = b.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = (for {
      (ia, xa, ya) <- av
      (ib, xb, yb) <- bv
      if (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= eps * eps
    } yield (ia, ib)).toSet

    got shouldBe expected
    expected should not be empty
  }

  test("strict < bound and residual conjuncts keep exact semantics") {
    val a = points(3, 250)
    val eps = 2.0
    val joined = a.as("a").join(a.as("b"),
      Geo.distSq(col("a.x"), col("a.y"), col("b.x"), col("b.y")) < eps * eps &&
        col("a.id") < col("b.id"))
    joined.queryExecution.executedPlan.toString should not include "BroadcastNestedLoopJoin"

    val got = joined.select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val av = a.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = (for {
      (ia, xa, ya) <- av
      (ib, xb, yb) <- av
      if ia < ib && (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) < eps * eps
    } yield (ia, ib)).toSet
    got shouldBe expected
  }

  test("joins with an equality conjunct are left to Spark's hash join") {
    val a = points(4, 100).withColumn("g", col("id") % 5)
    val joined = a.as("a").join(a.as("b"),
      col("a.g") === col("b.g") &&
        Geo.distSq(col("a.x"), col("a.y"), col("b.x"), col("b.y")) <= lit(4.0))
    // no rewrite marker columns anywhere in the plan
    joined.queryExecution.optimizedPlan.toString should not include "__graft_cx"
    joined.count() should be > 0L
  }
}
