package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The corpus-scaled k-NN graph family (registered as s30/s32/s34/s38
  * since round 14): derived geometry, hash-seed training, two-level
  * routing.
  */
class KnnScaledSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("derived geometry matches the oracle's count(*) arithmetic") {
    // nlist = greatest(32, ceil(n/64)) — the exact expression the
    // DuckDB prelude spells; ns = ceil(sqrt(nc))
    Similarity.scaledNlist(0L) shouldBe 32
    Similarity.scaledNlist(500L) shouldBe 32 // sf0.01 embeddings
    Similarity.scaledNlist(2048L) shouldBe 32
    Similarity.scaledNlist(2049L) shouldBe 33
    Similarity.scaledNlist(2000L * 100) shouldBe 3125 // the 100x ladder rung
    Similarity.scaledSuperList(32) shouldBe 6
    Similarity.scaledSuperList(33) shouldBe 6
    Similarity.scaledSuperList(36) shouldBe 6
    Similarity.scaledSuperList(3125) shouldBe 56
    Similarity.scaledSuperList(1) shouldBe 1
  }

  test("hash-seed trainer emits positional, integral centroids (the replay invariants)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val trained = Similarity.ivfTrainCentroidsFp(emb, nlist = 8,
      hashSeed = true)
    trained.length shouldBe 8
    trained.zipWithIndex.foreach { case ((cid, cv), i) =>
      cid shouldBe i.toLong
      all(cv.map(v => v == v.toLong.toDouble)) shouldBe true
    }
    // hashSeed only changes the seeds, never the Lloyd rounds: with the
    // same seeds both modes agree. nlist = 1 forces seed set {pos 0}
    // in BOTH modes (k-center's seed 0 IS the hash-order first point).
    val a = Similarity.ivfTrainCentroidsFp(emb, nlist = 1, hashSeed = true)
    val b = Similarity.ivfTrainCentroidsFp(emb, nlist = 1, hashSeed = false)
    a.map(_._2.toSeq) shouldBe b.map(_._2.toSeq)
  }

  test("firstNsSuperTable: prefix supers, exhaustive disjoint assignment, invariant gate") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val trained = Similarity.ivfTrainCentroidsFp(emb, nlist = 16,
      hashSeed = true)
    val (supers, cents) = Similarity.firstNsSuperTable(trained, 4)
    supers.map(_._1) shouldBe Seq(0L, 1L, 2L, 3L)
    supers.map(_._2) shouldBe trained.take(4).map(_._2.toSeq).toSeq
    cents.map(_._2).sorted shouldBe (0L until 16L) // every centroid exactly once
    all(cents.map(_._1)) should (be >= 0L and be < 4L)
    // a super's own cell contains it (argmax dot of an integral vector
    // with itself is maximal among the prefix... not guaranteed in
    // general cosine-land, but IS for these renormalized centroids —
    // pin it so routing degradation is visible)
    val own = cents.filter(c => c._2 < 4).map(c => (c._2, c._1))
    own.foreach { case (cid, sid) => sid shouldBe cid }
    // the replay-invariant gate fires on non-positional ids
    val bad = trained.zipWithIndex.map { case ((_, cv), i) => ((i + 7).toLong, cv) }
    an[IllegalArgumentException] should be thrownBy
      Similarity.firstNsSuperTable(bad, 2)
  }

  test("scaled graph: deterministic, complete, and recall within 80% of the flat k-center build") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val g1 = Similarity.knnGraphScaledFp(emb, k = 5)
      .select($"q_id", $"rnk".cast("long"), $"n_id", $"cos_sim")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val g2 = Similarity.knnGraphScaledFp(emb, k = 5)
      .select($"q_id", $"rnk".cast("long"), $"n_id", $"cos_sim")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    g1 should contain theSameElementsInOrderAs g2
    g1.map(_._1).distinct.length shouldBe emb.count() // every vector has neighbors
    val truth = Similarity.bruteForceTopK(emb, emb, k = 5)
      .select($"q_id", $"n_id")
    val nTruth = truth.count()
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select($"q_id", $"n_id").join(truth, Seq("q_id", "n_id"))
        .count().toDouble / nTruth
    val rScaled = recall(Similarity.knnGraphScaledFp(emb, k = 5))
    val rFlat = recall(Similarity.ivfKnnGraphTrainedFp(emb, k = 5,
      nlist = 32, nprobe = 4))
    info(f"graph recall@5 vs exact truth: flat-kcenter $rFlat%.3f, scaled $rScaled%.3f")
    rScaled should be >= 0.8 * rFlat
  }
}
