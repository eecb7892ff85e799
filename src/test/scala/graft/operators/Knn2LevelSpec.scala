package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The two-level-routed k-NN graph (s39) vs the flat-routed one (s30).
  *
  * superList = 1 puts every centroid in one super cell, so the level-2
  * rank sees exactly the flat candidate set — the two operators must
  * agree ROW FOR ROW (same trained quantizer, same tie rules, same
  * block-join tail). At the registered superList = 6 the IVF-tree
  * approximation may move boundary rows to a neighboring cell; the
  * graph-level agreement floor pins how much.
  */
class Knn2LevelSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"q_id", $"rnk".cast("long"), $"n_id", $"cos_sim")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))

  test("superList = 1 reproduces the flat-routed graph row for row") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val flat = rows(Similarity.ivfKnnGraphTrainedFp(emb, k = 5,
      nlist = 32, nprobe = 4))
    val two = rows(Similarity.ivfKnnGraphTrainedFp2L(emb, k = 5,
      nlist = 32, nprobe = 4, superList = 1))
    two.length shouldBe flat.length
    two should contain theSameElementsInOrderAs flat
  }

  test("registered config: two-level recall-vs-truth within 80% of flat's") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val truth = Similarity.bruteForceTopK(emb, emb, k = 5)
      .select($"q_id", $"n_id")
    val nTruth = truth.count()
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select($"q_id", $"n_id").join(truth, Seq("q_id", "n_id"))
        .count().toDouble / nTruth
    val rFlat = recall(Similarity.ivfKnnGraphTrainedFp(emb, k = 5,
      nlist = 32, nprobe = 4))
    val r2L = recall(Similarity.ivfKnnGraphTrainedFp2L(emb, k = 5,
      nlist = 32, nprobe = 4, superList = 6, superProbe = 3))
    info(f"graph recall@5 vs exact truth: flat $rFlat%.3f, two-level $r2L%.3f")
    // the metric that matters: how much TRUE-neighbor recall the tree
    // approximation costs at 1/routing-cost. Flat is itself an
    // approximation (nprobe-bound), so the floor is a RATIO — a
    // routing defect drops two-level recall to ~random, not to 80%.
    r2L should be >= 0.8 * rFlat
  }
}
