package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Measured quality of the TRAINED quality classifier (t46): fixed-point
  * naive-Bayes log-odds over hashed unigram+bigram features, distilling
  * t23's perplexity gate from a 256-doc deterministic sample. Like
  * AnnRecallSpec, generalization is a measurement, not folklore: the
  * floor is holdout accuracy on the docs the trainer never saw, against
  * the majority-class baseline.
  *
  * Context pinned here so it is not relearned: a 10-round full-batch
  * integer perceptron on the same features was tried first and thrashed
  * (train accuracy stuck at the majority rate — near-balanced labels,
  * highly-correlated features, and a tiny teacher margin make unit batch
  * steps oscillate), which is why the trainer is the closed-form NB
  * estimate + exact threshold calibration.
  */
class ClassifierSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // sf0.01: 500 docs, near-balanced teacher labels (249/251) — the
  // geometry the registered t46 runs at
  private val dir = "/root/testdata/sf0.01"

  test("trained NB classifier beats the majority baseline on held-out docs") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val labels = Mixture.lmPerplexity(docs, "doc_id", "text")
      .select($"doc_id", $"keep").persist()
    val (w, thr) = Mixture.trainQualityClassifierFp(docs, labels,
      dim = 4096, sampleN = 256)
    val P = 1000000007L
    val inSample = docs
      .select($"doc_id",
        ((lit(3L) * ($"doc_id" % P) + 8L) % P).as("h"))
      .join(labels.select($"doc_id"), "doc_id")
      .orderBy($"h".asc, $"doc_id".asc).limit(256)
      .select($"doc_id").as[Long].collect().toSet
    val scored = Mixture.applyQualityClassifier(docs, w, thr)
      .join(labels, Seq("doc_id"))
      .select($"doc_id", $"pred", $"keep").as[(Long, Boolean, Boolean)]
      .collect()
    val hold = scored.filterNot(r => inSample(r._1))
    hold.length should be > 200 // the sample must not swallow the corpus
    val holdAcc = hold.count(r => r._2 == r._3).toDouble / hold.length
    val majority = math.max(hold.count(_._3), hold.count(!_._3)).toDouble / hold.length
    info(f"holdout accuracy ${holdAcc}%.3f vs majority baseline ${majority}%.3f " +
      f"(${hold.length} held-out docs, threshold $thr)")
    holdAcc should be > 0.55
    holdAcc should be > majority + 0.05
    labels.unpersist()
  }

  test("training is bit-replayable: two trainings agree exactly") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val labels = Mixture.lmPerplexity(docs, "doc_id", "text")
      .select($"doc_id", $"keep").persist()
    val (w1, t1) = Mixture.trainQualityClassifierFp(docs, labels)
    val (w2, t2) = Mixture.trainQualityClassifierFp(docs, labels)
    t1 shouldBe t2
    w1.toSeq shouldBe w2.toSeq
    // the model actually has live weights (training saw both classes)
    w1.count(_ != 0L) should be > 100
    labels.unpersist()
  }

  test("empty corpus trains an all-zero model instead of crashing") {
    val empty = spark.range(0).select($"id".as("doc_id"),
      lit("").as("text"))
    val labels = spark.range(0).select($"id".as("doc_id"),
      lit(true).as("keep"))
    val (w, thr) = Mixture.trainQualityClassifierFp(empty, labels)
    thr shouldBe 0L
    w.forall(_ == 0L) shouldBe true
  }
}
