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

  test("upsert application: generation 2 recorded, serving, idempotent, exact vs reference fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_spec")
    synthCorpus(dir, 160, shift = 0)
    val d = dir.toString
    val k = 5
    val base = Similarity.ensureRankedKnnIndex(spark, d)
      .select($"q_id", $"rnk".cast("long"), $"n_id", $"cos_sim")
      .as[(Long, Long, Long, Double)].collect()
    val intents = graft.streaming.Streaming.streamGraphUpsert(spark, d)
      .select($"kind", $"q_id", $"n_id", $"cos_sim",
        coalesce($"rnk", lit(-1L)).cast("long"))
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5))
    val applied = Similarity.compactUpsertKnnIndex(spark, d)
      .select($"q_id", $"rnk".cast("long"), $"n_id", $"cos_sim")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // reference fold, driver-side: adopt / re-rank / keep
    val ups = intents.filter(_._1 == "upsert")
      .map(r => (r._2, r._3, r._4))
    val affected = ups.map(_._1).toSet
    val keep = base.filter(r => !affected.contains(r._1))
    val rer = (base.filter(r => affected.contains(r._1))
        .map(r => (r._1, r._3, r._4)) ++ ups)
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.map(r => (r._2, r._3)).sortBy { case (id, c) => (-c, id) }
          .take(k).zipWithIndex
          .map { case ((id, c), i) => (q, (i + 1).toLong, id, c) }
      }
    // arriving rows adopt the WAL's rank verbatim (computed on the raw
    // cosine upstream — recomputing from the rounded readout could
    // swap 6-dp ties)
    val nw = intents.filter(_._1 == "new_topk")
      .map(r => (r._2, r._5, r._3, r._4))
    val expect = (keep ++ rer ++ nw).sortBy(r => (r._1, r._2))
    applied should contain theSameElementsInOrderAs expect
    // manifest: generation 2 serving with the intent count; idempotent
    val m = Similarity.rankedAssetManifest(spark, d)
      .as[(String, Long, Long, Long, Long, Boolean, Long)].collect()
      .sortBy(_._2)
    m.map(_._2).toSeq shouldBe Seq(0L, 2L)
    m(1)._5 shouldBe intents.length.toLong
    m(1)._3 shouldBe applied.length.toLong
    m(1)._3 shouldBe m(1)._7
    m.map(_._6).toSeq shouldBe Seq(false, true)
    val marker = new java.io.File(Assets.assetPath(spark,
      s"graft_knn_ranked_5_64_4_3_${Assets.tagOf(d)}_gen2") + "_source")
    val mt = marker.lastModified()
    Similarity.compactUpsertKnnIndex(spark, d)
    marker.lastModified() shouldBe mt
  }

  test("generation-routed read path: servingRankedKnnIndex follows the manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_genserve_spec")
    synthCorpus(dir, 160, shift = 3)
    val d = dir.toString
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"q_id", $"rnk".cast("long"), $"n_id", $"cos_sim")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // before any compaction the manifest's highest generation IS the
    // fresh build — the read path must serve generation 0
    val gen0 = rows(Similarity.ensureRankedKnnIndex(spark, d))
    rows(Similarity.servingRankedKnnIndex(spark, d)) shouldBe gen0
    // the WAL flush publishes generation 2; the SAME lookup — no code
    // change at the query tier — now serves the applied table
    val gen2 = rows(Similarity.compactUpsertKnnIndex(spark, d))
    rows(Similarity.servingRankedKnnIndex(spark, d)) shouldBe gen2
    gen2 should not be gen0 // the flush actually changed what serves
  }
}
