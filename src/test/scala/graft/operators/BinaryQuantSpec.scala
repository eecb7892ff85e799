package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Binary sign-bit quantization + Hamming-rerank ANN (s21).
  *
  * The codegen kernel ([[graft.functions.SignPackExpr]]) is checked
  * against an independent interpreted spelling; the full two-stage
  * operator is checked against a driver-side replay on the real
  * embeddings table; recall@k vs the exact cosine baseline is measured
  * (loose floor pinned, exact value to the test log) — same contract as
  * AnnRecallSpec's PQ/IVF rows.
  */
class BinaryQuantSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("SignPackExpr matches an interpreted sign fold (codegen parity)") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // independent spelling: sum of CASE-selected powers of two via the
    // interpreted aggregate HOF (bit 63 = min-long, no 1<<63 literal)
    val interpreted = expr(
      """aggregate(sequence(0, 63), 0L, (acc, d) ->
        |  acc | CASE WHEN element_at(embedding, d + 1) > 0F
        |            THEN shiftleft(1L, d) ELSE 0L END)""".stripMargin)
    val bad = emb.select(Similarity.signPack($"embedding").as("a"),
        interpreted.as("b"))
      .filter($"a" =!= $"b" || $"a".isNull =!= $"b".isNull)
      .count()
    bad shouldBe 0L

    // null element poisons to NULL like the other vector kernels
    val row = Seq(Tuple1(Array(1.0f, -2.0f))).toDF("v")
      .select(Similarity.signPack($"v").as("s")).head
    row.getLong(0) shouldBe 1L
    val nul = spark.sql("SELECT array(1.0F, cast(NULL as float)) v")
      .select(Similarity.signPack($"v").as("s")).head
    nul.isNullAt(0) shouldBe true
  }

  test("binaryRerankTopK matches a driver-side replay on the real table") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val rows = emb.select($"vec_id".cast("long"), $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def sig(v: Array[Float]): Long = {
      var s = 0L
      var d = 0
      while (d < math.min(64, v.length)) {
        if (v(d) > 0) s |= (1L << d); d += 1
      }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val sigs = rows.map { case (id, v) => (id, sig(v)) }.toMap
    val vecs = rows.toMap
    val expected = rows.filter(_._1 < 5).flatMap { case (qid, qv) =>
      val cands = rows.filter(_._1 != qid)
        .map { case (nid, _) =>
          (nid, java.lang.Long.bitCount(sigs(qid) ^ sigs(nid)).toLong)
        }
        .sortBy { case (nid, h) => (h, nid) }
        .take(40)
      cands.map { case (nid, h) => (nid, h, cos(qv, vecs(nid))) }
        .sortBy { case (nid, _, c) => (-c, nid) }
        .take(5)
        .zipWithIndex
        .map { case ((nid, h, c), i) =>
          (qid, nid, (i + 1).toLong, h,
            BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.sortBy(t => (t._1, t._3))
    val got = Similarity.binaryRerankTopK(emb, emb.filter($"vec_id" < 5), k = 5, cand = 40)
      .select($"q_id".cast("long"), $"n_id".cast("long"), $"rnk".cast("long"),
        $"hamming", $"cos_sim")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._3))
    got.toSeq shouldBe expected.toSeq
  }

  test("binary-rerank recall@k vs exact cosine top-k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val k = 10
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk(Similarity.bruteForceTopK(emb, queries, k))
    def recallAt(cand: Int): Double = {
      val got = topk(Similarity.binaryRerankTopK(emb, queries, k, cand = cand))
      val rs = exact.map { case (qid, ex) =>
        got.getOrElse(qid, Set.empty).count(ex).toDouble / ex.size }
      rs.sum / rs.size
    }
    val r40 = recallAt(40)
    val r100 = recallAt(100)
    info(f"binary-rerank recall@$k vs exact cosine: cand=40 $r40%.3f, cand=100 $r100%.3f")
    // more candidates must not hurt (rerank is exact within the pool)
    r100 should be >= r40
    r40 should be > 0.2 // 1 bit/dim is coarse; floor = "useful at all"
  }

  test("sq8 (int8 scalar quantization) recall@k vs exact; beats 1-bit at equal cand") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val k = 10
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk(Similarity.bruteForceTopK(emb, queries, k))
    def recall(got: Map[Long, Set[Long]]): Double = {
      val rs = exact.map { case (qid, ex) =>
        got.getOrElse(qid, Set.empty).count(ex).toDouble / ex.size }
      rs.sum / rs.size
    }
    val sq40 = recall(topk(Similarity.sq8RerankTopK(emb, queries, k, cand = 40)))
    val bin40 = recall(topk(Similarity.binaryRerankTopK(emb, queries, k, cand = 40)))
    info(f"sq8-rerank recall@$k vs exact cosine: cand=40 $sq40%.3f (1-bit at cand=40: $bin40%.3f)")
    // 8 bits/dim carries far more of the geometry than 1 bit/dim
    sq40 should be >= bin40
    sq40 should be > 0.5
  }

  test("parameter guard: cand must cover k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    an[IllegalArgumentException] should be thrownBy
      Similarity.binaryRerankTopK(emb, emb.filter($"vec_id" < 5), k = 10, cand = 5)
  }
}
