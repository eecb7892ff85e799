package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract gate for [[Dedup.contamination]]'s eval-size parameter:
  * identical results both ways, and — the scale property — with
  * `evalIsBenchmarkSized=false` the plan must DEGRADE to a shuffled
  * join when the eval side isn't broadcastable (simulated by disabling
  * the broadcast threshold), never force an O(|eval|) broadcast
  * through the driver. With `true` the forced broadcast wins even
  * under the same threshold, which is the benchmark-sized fast path.
  */
class ContaminationSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    val words = "the quick brown fox jumps over a lazy dog near my old red barn".split(" ")
    val rnd = new scala.util.Random(3)
    (0 until 120).map { i =>
      (i.toLong, Seq.fill(20)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def run(benchmarkSized: Boolean) = {
    val d = docs
    val train = d.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0)
    val eval = d.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
    Dedup.contamination(train, eval, "text", "doc_id",
      evalIsBenchmarkSized = benchmarkSized)
  }

  test("results identical with and without the broadcast contract") {
    val a = run(benchmarkSized = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val b = run(benchmarkSized = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    a should not be empty
    a.exists(_._2 > 0) shouldBe true // planted overlap actually hits
    b shouldBe a
  }

  test("large eval side degrades to a shuffled join, never a forced broadcast") {
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val unhinted = run(benchmarkSized = false)
      unhinted.count()
      val plan = unhinted.queryExecution.executedPlan.toString
      plan should not include "BroadcastHashJoin"
      (plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")) shouldBe true
      // the benchmark-sized contract still broadcasts under the same conf
      val hinted = run(benchmarkSized = true)
      hinted.count()
      hinted.queryExecution.executedPlan.toString should include("BroadcastHashJoin")
    } finally {
      saved.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      savedAqe.fold(conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
    }
  }
}
