package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** JL random-projection two-stage ANN (s33): driver replay parity,
  * the JL concentration property (projected integer L2 ≈ r·2^40·true
  * L2 on average), and measured recall vs the exact cosine baseline
  * by target dimension.
  */
class JlProjectionSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def sign(i: Int, j: Int, r: Int): Long = {
    val m1 = (i.toLong * r + j + 1) * 2654435761L % 2147483648L
    val m2 = (m1 ^ (m1 >> 13)) * 1274126177L % 2147483648L
    if ((m2 >> 7) % 2 == 0) 1L else -1L
  }

  private def project(v: Array[Float], r: Int): Array[Long] = {
    val qx = v.map(x => math.floor(x.toDouble * 1048576).toLong)
    Array.tabulate(r) { j =>
      var s = 0L; var i = 0
      while (i < qx.length) { s += qx(i) * sign(i, j, r); i += 1 }
      s
    }
  }

  private def cosFull(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("jlTopK matches a driver-side replay on the real table") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val rows = emb.select($"vec_id".cast("long"), $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val vecs = rows.toMap
    val proj = rows.map { case (id, v) => (id, project(v, 16)) }.toMap
    val expected = rows.filter(_._1 < 5).flatMap { case (qid, qv) =>
      val qp = proj(qid)
      val cands = rows.filter(_._1 != qid)
        .map { case (nid, _) =>
          val np = proj(nid)
          var d2 = 0L; var j = 0
          while (j < 16) { val d = qp(j) - np(j); d2 += d * d; j += 1 }
          (nid, d2)
        }
        .sortBy { case (nid, d2) => (d2, nid) }
        .take(40)
      cands.map { case (nid, d2) => (nid, d2, cosFull(qv, vecs(nid))) }
        .sortBy { case (nid, _, c) => (-c, nid) }
        .take(5)
        .zipWithIndex
        .map { case ((nid, d2, c), i) =>
          def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (qid, nid, (i + 1).toLong, d2, r6(c))
        }
    }.sortBy(t => (t._1, t._3))
    val got = Similarity.jlTopK(emb, emb.filter($"vec_id" < 5), k = 5,
        dims = 64, targetDims = 16, cand = 40)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._3))
    got.toSeq shouldBe expected.toSeq
  }

  test("JL concentration: projected integer L2 tracks true L2 within the lemma's regime") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val rows = emb.select($"vec_id".cast("long"), $"embedding")
      .filter($"vec_id" < 64).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val r = 16
    val proj = rows.map { case (id, v) => (id, project(v, r)) }.toMap
    val ratios = for {
      (ua, va) <- rows; (ub, vb) <- rows if ua < ub
    } yield {
      var trueD2 = 0.0; var i = 0
      while (i < va.length) {
        val d = (va(i) - vb(i)).toDouble * 1048576; trueD2 += d * d; i += 1
      }
      val pa = proj(ua); val pb = proj(ub)
      var pd2 = 0.0; var j = 0
      while (j < r) { val d = (pa(j) - pb(j)).toDouble; pd2 += d * d; j += 1 }
      pd2 / (r * trueD2)
    }
    val mean = ratios.sum / ratios.size
    val within50 = ratios.count(x => x > 0.5 && x < 1.5).toDouble / ratios.size
    info(f"JL ratio over ${ratios.size} pairs at r=$r: mean $mean%.3f, within ±50%% $within50%.3f")
    mean should be (1.0 +- 0.15) // E[ratio] = 1 for ±1 projections
    within50 should be > 0.8     // concentration at r=16 is loose but real
  }

  test("JL recall@k vs exact cosine top-k, by target dimension") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val k = 10
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk(Similarity.bruteForceTopK(emb, queries, k))
    def recallAt(r: Int): Double = {
      val got = topk(Similarity.jlTopK(emb, queries, k, dims = 64,
        targetDims = r, cand = 40))
      val rs = exact.map { case (qid, ex) =>
        got.getOrElse(qid, Set.empty).count(ex).toDouble / ex.size }
      rs.sum / rs.size
    }
    val r8 = recallAt(8)
    val r16 = recallAt(16)
    val r32 = recallAt(32)
    info(f"JL recall@$k vs exact (cand=40): r8 $r8%.3f, r16 $r16%.3f, r32 $r32%.3f")
    r32 should be >= r16
    r16 should be > 0.2
  }
}
