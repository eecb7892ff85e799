package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Matryoshka prefix-dimension two-stage ANN (s22): driver replay
  * parity and measured recall vs the exact cosine baseline at two
  * prefix widths.
  */
class MatryoshkaSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def cosPre(a: Array[Float], b: Array[Float], dims: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < dims) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("matryoshkaTopK matches a driver-side replay on the real table") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val rows = emb.select($"vec_id".cast("long"), $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val vecs = rows.toMap
    val expected = rows.filter(_._1 < 5).flatMap { case (qid, qv) =>
      val cands = rows.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, cosPre(qv, nv, 16)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(40)
      cands.map { case (nid, pre) => (nid, pre, cosPre(qv, vecs(nid), 64)) }
        .sortBy { case (nid, _, c) => (-c, nid) }
        .take(5)
        .zipWithIndex
        .map { case ((nid, pre, c), i) =>
          def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (qid, nid, (i + 1).toLong, r6(pre), r6(c))
        }
    }.sortBy(t => (t._1, t._3))
    val got = Similarity.matryoshkaTopK(emb, emb.filter($"vec_id" < 5), k = 5,
        prefixDims = 16, cand = 40)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._3))
    got.toSeq shouldBe expected.toSeq
  }

  test("prefix-dim recall@k vs exact cosine top-k, by prefix width") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val k = 10
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk(Similarity.bruteForceTopK(emb, queries, k))
    def recallAt(pre: Int): Double = {
      val got = topk(Similarity.matryoshkaTopK(emb, queries, k, prefixDims = pre, cand = 40))
      val rs = exact.map { case (qid, ex) =>
        got.getOrElse(qid, Set.empty).count(ex).toDouble / ex.size }
      rs.sum / rs.size
    }
    val r8 = recallAt(8)
    val r16 = recallAt(16)
    val r32 = recallAt(32)
    info(f"matryoshka recall@$k vs exact (cand=40): prefix8 $r8%.3f, " +
      f"prefix16 $r16%.3f, prefix32 $r32%.3f")
    // longer prefixes approximate the full metric better
    r32 should be >= r16
    r16 should be > 0.2
  }
}
