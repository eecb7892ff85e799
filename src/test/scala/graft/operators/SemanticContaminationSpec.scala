package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantic-decontamination contract: the exact (vouched-broadcast)
  * path flags exactly the corpus vectors with an eval match at or
  * above the threshold, reporting the argmax eval id with ties to the
  * lowest id; the centroid-blocked scale path is a subset of the
  * exact verdicts (it can only lose boundary matches, never invent
  * them) with measured recall.
  */
class SemanticContaminationSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpusAndEval() = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    (emb.filter($"vec_id" % 7 =!= 0),
      emb.filter($"vec_id" % 7 === 0)
        .select($"vec_id".as("eval_id"), $"embedding"))
  }

  test("exact path: planted eval copies are flagged with cos 1.0 against their source") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.filter($"vec_id" < 100)
    // eval set = scaled copies of every 10th corpus vector (cosine is
    // scale-invariant, so the match is exactly 1.0)
    val eval = corpus.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 5000L).as("eval_id"),
        transform($"embedding", x => x * lit(3.0f)).as("embedding"))
    val out = Similarity.semanticContamination(corpus, eval,
      minCos = 0.999, evalIsBenchmarkSized = true).collect()
    out.length shouldBe corpus.count()
    val flagged = out.filter(_.getLong(3) == 1L)
    flagged.map(_.getLong(0)).sorted shouldBe
      corpus.filter($"vec_id" % 10 === 0).select($"vec_id".cast("long"))
        .as[Long].collect().sorted
    flagged.foreach { r =>
      r.getLong(1) shouldBe r.getLong(0) + 5000L // its own planted copy
      r.getDouble(2) shouldBe 1.0 +- 1e-6
    }
  }

  test("exact path reports one verdict per corpus vector and argmax ties go low") {
    val (corpus, eval) = corpusAndEval()
    val out = Similarity.semanticContamination(corpus, eval,
      minCos = 0.8, evalIsBenchmarkSized = true)
    out.count() shouldBe corpus.count()
    // replay the argmax on the driver for a sample of rows
    val evRows = eval.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val sample = corpus.filter($"vec_id" < 40).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val got = out.filter($"vec_id" < 40).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.foreach { case (id, v) =>
      val best = evRows.toSeq.map { case (e, ev) => (cos(v, ev), e) }
        .sortBy { case (c, e) => (-c, e) }.head._2
      withClue(s"corpus $id argmax:") { got(id) shouldBe best }
    }
  }

  test("blocked path never invents a contamination verdict; recall is reported") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.filter($"vec_id" % 7 =!= 0)
    // plant scaled copies of every 31st corpus vector as eval rows:
    // natural cross-pair cosine in this fixture tops out near 0.45, so
    // contamination at a high bar must be planted (cosine is
    // scale-invariant — each copy matches its source at exactly 1.0)
    val eval = corpus.filter($"vec_id" % 31 === 0)
      .select(($"vec_id" + 5000L).as("eval_id"),
        transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    val exact = Similarity.semanticContamination(corpus, eval,
        minCos = 0.999, evalIsBenchmarkSized = true)
      .filter($"contaminated" === 1L).select($"vec_id".cast("long"))
      .as[Long].collect().toSet
    val blocked = Similarity.semanticContamination(corpus, eval,
        minCos = 0.999, evalIsBenchmarkSized = false, nlist = 16)
      .filter($"contaminated" === 1L).select($"vec_id".cast("long"))
      .as[Long].collect().toSet
    // blocked cosines are a subset of the exact candidate set, so a
    // blocked verdict implies an exact one
    blocked.diff(exact) shouldBe empty
    exact should not be empty
    val recall = blocked.size.toDouble / exact.size
    info(f"blocked-path recall vs exact: ${recall}%.3f (${blocked.size}/${exact.size})")
    recall should be >= 0.5
  }

  test("blocked path: rows whose cell holds no eval vectors keep null eval_id") {
    val (corpus, _) = corpusAndEval()
    // a single far-away eval vector => most cells empty of eval rows
    val lone = Seq((99999L, Array.fill(64)(0.001f).updated(0, 1.0f)))
      .toDF("eval_id", "embedding")
    val out = Similarity.semanticContamination(corpus, lone,
      minCos = 0.999, evalIsBenchmarkSized = false, nlist = 16).collect()
    out.length shouldBe corpus.count()
    val absent = out.filter(_.isNullAt(1))
    absent.foreach { r => r.getLong(3) shouldBe 0L } // null match => clean
  }
}
