package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** HyperLogLog distinct-count sketch (t30): measured estimate quality
  * on the real shingle stream (~16k distinct — the raw-HLL regime),
  * the duplicate-invariance property that makes registers mergeable,
  * and precision scaling.
  */
class HllSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def shingleHashes = Dedup.shingles(
    spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id", n = 3)
    .select(col("sh"))

  test("estimate tracks the exact distinct count on the real shingle stream") {
    val row = TextIndex.hllDistinct(shingleHashes, "sh", p = 10).head
    val (m, vZero, nExact, est, relErr) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3), row.getDouble(4))
    m shouldBe 1024L
    nExact should be > 2560L * 2 // well clear of the small-range regime
    info(f"HLL p=10: exact=$nExact est=$est%.1f rel_err=$relErr%.4f v_zero=$vZero")
    // standard error at p=10 is 1.04/sqrt(1024) ~ 3.3%; allow 5 sigma
    relErr should be < 0.17
  }

  test("duplicating the stream does not move a single register (merge-by-max)") {
    val once = TextIndex.hllDistinct(shingleHashes, "sh", p = 10).head
    val twice = TextIndex.hllDistinct(
      shingleHashes.unionByName(shingleHashes), "sh", p = 10).head
    // registers keep max rank per bucket: duplicates are absorbed, so
    // every output column is bit-identical — the property that makes
    // the sketch partial-aggregatable (merge = max) at any parallelism
    twice shouldBe once
  }

  test("more registers cannot make the estimate qualitatively worse") {
    val e10 = TextIndex.hllDistinct(shingleHashes, "sh", p = 10).head.getDouble(4)
    val e11 = TextIndex.hllDistinct(shingleHashes, "sh", p = 11).head.getDouble(4)
    info(f"rel_err p=10 $e10%.4f, p=11 $e11%.4f")
    // p=11 halves the variance; allow generous slack for one draw
    e11 should be < math.max(0.17, e10 * 2)
  }

  test("per-group sketch matches running the global sketch on each group alone") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val withLang = Dedup.shingles(docs, "text", "doc_id", n = 3)
      .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
    val grouped = TextIndex.hllDistinctByGroup(withLang, "lang", "sh", p = 8)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    grouped.keySet.size should be >= 3
    for ((lang, row) <- grouped) {
      val alone = TextIndex.hllDistinct(
        withLang.filter(col("lang") === lang).select(col("sh")), "sh", p = 8).head
      // keying registers by group is EXACTLY partitioning the stream:
      // per-group rows must equal the global sketch of that group alone
      (alone.getLong(1), alone.getLong(2), alone.getDouble(3)) shouldBe row
    }
  }

  test("parameter guard") {
    val vals = Seq(1L, 2L).toDF("sh")
    an[IllegalArgumentException] should be thrownBy
      TextIndex.hllDistinct(vals, "sh", p = 3)
    an[IllegalArgumentException] should be thrownBy
      TextIndex.hllDistinct(vals, "sh", p = 17)
    an[IllegalArgumentException] should be thrownBy
      TextIndex.hllEstByGroup(vals.withColumn("g", lit("a")), "g", "sh", p = 3)
  }

  test("hllEstByGroup: same estimate as the exact-rider path, NO Expand in the plan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val withLang = Dedup.shingles(docs, "text", "doc_id", n = 3)
      .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
    val sketch = TextIndex.hllEstByGroup(withLang, "lang", "sh", p = 8)
    // the 100 TB contract: the sketch path must plan as plain hash
    // aggregates — no count-distinct Expand anywhere (that is the
    // whole point of swapping NDV for HLL in a petabyte ANALYZE)
    val plan = sketch.queryExecution.executedPlan.toString
    plan should not include "Expand"
    val est = sketch.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val withRider = TextIndex.hllDistinctByGroup(withLang, "lang", "sh", p = 8)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    est.keySet shouldBe withRider.keySet
    for ((g, e) <- est) e shouldBe withRider(g)
  }
}
