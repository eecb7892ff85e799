package graft.functions

import graft.operators.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Measures the thing ZOrder exists for: after a z-keyed
  * range-partitioned write, per-FILE min/max envelopes are tight on
  * BOTH interleaved dimensions, so a conjunctive 2-D range predicate
  * rules out most files from their statistics alone — while the same
  * data laid out by arrival key (event_id) puts the whole space in
  * every file and prunes nothing. The file envelope check below is
  * exactly the skip decision a parquet reader makes from footer
  * row-group stats (and a lakehouse makes from file-level stats).
  */
class ZOrderLayoutSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val out =
    java.nio.file.Files.createTempDirectory("graft_zorder").toString

  test("z-sorted layout prunes the non-leading dimension at file level; arrival order does not") {
    val xc = expr("cast(floor(value * 2) as bigint)")
    val yc = expr("(ts div 1000000000 - 1704067200) div 3600")
    val pts = graft.sources.Sources.events(spark, "/root/testdata/sf0.01")
      .select($"event_id", xc.as("xc"), yc.as("yc"))
      .withColumn("z", ZOrder.interleave($"xc", $"yc"))

    // The predicate is on x ALONE — the dimension the arrival layout
    // does NOT sort by (event_id tracks ts, so an id-ranged write is
    // already a y-sorted layout and would prune a time box; the case
    // z-order uniquely wins is the non-leading dimension). The skip
    // decision is the file-stat envelope check a parquet reader makes:
    // can [xmin, xmax] intersect [xlo, xhi]?
    val (xlo, xhi) = (256L, 319L)
    def overlapping(dir: String): (Int, Int) = {
      val env = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("xc").as("xmin"), max("xc").as("xmax"))
        .collect()
      val hit = env.count(r => r.getLong(1) <= xhi && r.getLong(2) >= xlo)
      (hit, env.length)
    }

    val zDir = s"$out/by_z"
    pts.repartitionByRange(16, $"z").sortWithinPartitions($"z")
      .write.mode("overwrite").parquet(zDir)
    val (zHit, zTotal) = overlapping(zDir)

    val idDir = s"$out/by_id"
    pts.repartitionByRange(16, $"event_id").sortWithinPartitions($"event_id")
      .write.mode("overwrite").parquet(idDir)
    val (idHit, idTotal) = overlapping(idDir)

    zTotal shouldBe 16
    idTotal shouldBe 16
    // arrival (≈ time-sorted) layout: every file spans the whole x
    // range, so the non-leading-dimension predicate skips nothing
    idHit should be >= idTotal * 3 / 4
    // z layout: x ∈ [256, 320) pins an interleaved bit block, so the
    // matching rows sit in a few contiguous z runs — most files are
    // provably disjoint from their stats alone
    zHit should be <= zTotal / 2

    // and the layout change costs nothing in fidelity: same rows
    spark.read.parquet(zDir).count() shouldBe
      spark.read.parquet(idDir).count()
  }
}
