package graft.sources

import graft.operators.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Sink coverage (SURVEY §2.1 op #25) across every Spark-native file
  * format in the build: a real query result round-trips through
  * parquet, ORC, JSON, and CSV with rows intact (schema intact where
  * the format is typed; JSON/CSV re-read through an explicit schema,
  * which is how a production pipeline consumes them).
  */
class SinkFormatsSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val out = java.nio.file.Files
    .createTempDirectory("graft_sinks").toString

  test("query result round-trips through parquet, orc, json, csv") {
    val result = graft.SparkEntry.queries("q01_pricing_summary")(
      spark, "/root/testdata/sf0.001")
    val rows = result.collect()
    rows.length should be > 0
    val schema = result.schema

    // typed columnar formats: schema must survive as-is
    for (fmt <- Seq("parquet", "orc")) {
      val dir = s"$out/$fmt"
      result.write.mode("overwrite").format(fmt).save(dir)
      val back = spark.read.format(fmt).load(dir)
      back.schema.map(f => (f.name, f.dataType)) shouldBe
        schema.map(f => (f.name, f.dataType))
      back.collect().toSet shouldBe rows.toSet
    }

    // text formats: re-read through the explicit schema
    val jsonDir = s"$out/json"
    result.write.mode("overwrite").json(jsonDir)
    spark.read.schema(schema).json(jsonDir).collect().toSet shouldBe rows.toSet

    val csvDir = s"$out/csv"
    result.write.mode("overwrite").option("header", "true").csv(csvDir)
    spark.read.schema(schema).option("header", "true").csv(csvDir)
      .collect().toSet shouldBe rows.toSet
  }

  test("partitioned parquet sink prunes on read") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"lang", $"n_chars")
    val dir = s"$out/part"
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter($"lang" === "en")
    val scanned = one.queryExecution.executedPlan.toString
    // partition pruning: the lang=en predicate must reach the scan as
    // a partition filter, not a post-scan filter
    scanned should include("PartitionFilters")
    one.count() shouldBe docs.filter($"lang" === "en").count()
  }
}
