package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The asset-lifecycle contract (s45's row oracles the numbers against
  * DuckDB; this pins the LIFECYCLE semantics on a mutable synthetic
  * corpus the read-only testdata can't exercise): generation 0 is
  * recorded on build with the stored row count; compaction publishes
  * generation 1 with the batch size and becomes serving; a replayed
  * batch is idempotent (no rebuild); a GROWN batch republishes
  * generation 1; and a base-corpus change resets the manifest to a
  * fresh generation 0.
  */
class AssetManifestSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def synthCorpus(dir: java.nio.file.Path, n: Int, shift: Int): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val staging = dir.resolve("staging")
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        (((i * 13 + j * 7 + shift) % 29) - 14).toFloat / 7f), s"l${i % 3}")
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging)
      .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part, dir.resolve("embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  test("manifest lifecycle: build, compact, idempotence, grown batch, base reset") {
    val dir = java.nio.file.Files.createTempDirectory("graft_asset_spec")
    synthCorpus(dir, 160, shift = 0)
    val d = dir.toString
    val emb = () => spark.read.parquet(s"$d/embeddings.parquet")

    // generation 0: recorded with the stored row count
    val g0 = Similarity.ensureRankedKnnIndex(spark, d)
    val m0 = Similarity.rankedAssetManifest(spark, d)
      .as[(String, Long, Long, Long, Long, Boolean, Long)].collect()
    m0.map(_._2).toSeq shouldBe Seq(0L)
    m0.head._3 shouldBe g0.count()
    m0.head._3 shouldBe m0.head._7 // manifest count == stored count
    m0.head._6 shouldBe true       // only generation -> serving

    // compaction: generation 1 serving, batch size recorded, rows ==
    // the incremental tombstone dataflow's output
    val del1 = emb().filter($"vec_id" % 10 === 3).select($"vec_id")
    val g1 = Similarity.compactRankedKnnIndex(spark, d, del1)
    val m1 = Similarity.rankedAssetManifest(spark, d)
      .as[(String, Long, Long, Long, Long, Boolean, Long)].collect()
      .sortBy(_._2)
    m1.map(_._2).toSeq shouldBe Seq(0L, 1L)
    m1(1)._4 shouldBe del1.count()
    m1(1)._3 shouldBe g1.count()
    m1(1)._3 shouldBe m1(1)._7
    m1.map(_._6).toSeq shouldBe Seq(false, true) // gen 1 serving

    // replayed batch: idempotent — the generation marker keys on the
    // tombstone-set signature, so nothing is rebuilt or re-recorded
    val marker = new java.io.File(Assets.assetPath(spark,
      s"graft_knn_ranked_5_64_4_3_${Assets.tagOf(d)}_gen1") + "_source")
    val mt = marker.lastModified()
    Similarity.compactRankedKnnIndex(spark, d, del1)
    marker.lastModified() shouldBe mt

    // grown batch: generation 1 republished with the new size
    val del2 = emb().filter($"vec_id" % 5 === 3).select($"vec_id")
    Similarity.compactRankedKnnIndex(spark, d, del2)
    val m2 = Similarity.rankedAssetManifest(spark, d)
      .as[(String, Long, Long, Long, Long, Boolean, Long)].collect()
      .sortBy(_._2)
    m2.map(_._2).toSeq shouldBe Seq(0L, 1L)
    m2(1)._4 shouldBe del2.count()
    m2(1)._3 shouldBe m2(1)._7

    // base-corpus change: the manifest resets to a fresh generation 0
    // (stale compactions described a dead asset)
    synthCorpus(dir, 170, shift = 5)
    Similarity.ensureRankedKnnIndex(spark, d)
    val m3 = Similarity.rankedAssetManifest(spark, d)
      .as[(String, Long, Long, Long, Long, Boolean, Long)].collect()
    m3.map(_._2).toSeq shouldBe Seq(0L)
    m3.head._6 shouldBe true
  }
}
