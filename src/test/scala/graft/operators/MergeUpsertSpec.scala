package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q46_merge_upsert: CDC MERGE semantics on the real sf0.001 tables.
  *
  * The oracle pins cross-engine equality; this spec pins the MERGE
  * contract itself: the output is a total function of dim-keys union
  * change-keys, every row is classified into exactly one branch, the
  * 'update'/'keep' rows preserve the dimension payload, and the change
  * columns carry the argmax (latest s, then highest event_id) event —
  * so a future re-spelling (e.g. to a window) must keep the semantics.
  */
class MergeUpsertSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val out =
    graft.SparkEntry.queries("q46_merge_upsert")(spark, sfDir)
      .persist()

  test("output keys = dim keys union rebased change keys, exactly once") {
    val cust = graft.sources.Sources.table(spark, sfDir, "customer")
      .select(col("c_custkey").as("k"))
    val ev = graft.sources.Sources.events(spark, sfDir)
      .select((col("user_id") * 31L).as("k")).distinct()
    val wantKeys = cust.union(ev).distinct().count()
    out.count() shouldBe wantKeys
    out.select("merge_key").distinct().count() shouldBe wantKeys
  }

  test("branch classification is total and payload-preserving") {
    val counts = out.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.keySet should contain allOf ("insert", "update", "keep")
    // inserts carry no dim payload; keeps carry no change payload
    out.filter(col("action") === "insert")
      .filter(col("c_name").isNotNull).count() shouldBe 0L
    out.filter(col("action") === "keep")
      .filter(col("last_type").isNotNull || col("n_events") =!= 0L)
      .count() shouldBe 0L
    out.filter(col("action") === "update")
      .filter(col("c_name").isNull || col("last_type").isNull)
      .count() shouldBe 0L
  }

  test("change columns are the latest event per rebased key") {
    val secs = expr("ts div 1000000000")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("mk")).orderBy(col("s").desc, col("event_id").desc)
    val latest = graft.sources.Sources.events(spark, sfDir)
      .select((col("user_id") * 31L).as("mk"), col("event_id"),
        col("event_type"), secs.as("s"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val mismatches = out.filter(col("action") =!= "keep")
      .join(latest, col("merge_key") === col("mk"))
      .filter(col("last_type") =!= col("event_type") ||
        col("last_seen_s") =!= col("s"))
      .count()
    mismatches shouldBe 0L
  }
}
