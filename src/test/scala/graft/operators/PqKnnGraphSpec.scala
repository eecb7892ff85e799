package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{AdcFp, L2Fp, PqEncodeFp}

/** The PQ-compressed k-NN graph (s38) and its codegen kernels.
  *
  * The end-to-end bit-exactness of the build (training included) is
  * held by the s38 DuckDB oracle; this spec holds what the oracle
  * can't see — that the CODEGEN kernels equal an independent driver
  * replay (interpreted eval AND a hand-rolled Scala loop), the
  * encode's argmin optimality, and the graph-quality floor vs the
  * full-vector exact graph (s30) under the same routing.
  */
class PqKnnGraphSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a small deterministic codebook + residuals exercising ties,
  // negatives, and the full code range
  private val m = 4
  private val ncw = 8
  private val sub = 4
  private val cb: Array[Long] = Array.tabulate(m * ncw * sub) { p =>
    ((p.toLong * 2654435761L) % 97L) - 48L
  }
  private def qresRow(seed: Long): Array[Long] =
    Array.tabulate(m * sub)(i => ((seed * 31L + i) * 1103515245L % 83L) - 41L)

  private def encodeRef(q: Array[Long]): Array[Long] =
    Array.tabulate(m) { j =>
      var best = 0L; var bestD2 = Long.MaxValue
      (0 until ncw).foreach { cw =>
        var d2 = 0L
        (0 until sub).foreach { i =>
          val d = q(j * sub + i) - cb((j * ncw + cw) * sub + i); d2 += d * d
        }
        if (d2 < bestD2) { bestD2 = d2; best = cw }
      }
      best
    }
  private def adcRef(q: Array[Long], codes: Array[Long]): Long = {
    var acc = 0L
    (0 until m).foreach { j =>
      val base = (j * ncw + codes(j).toInt) * sub
      (0 until sub).foreach { i =>
        val d = q(j * sub + i) - cb(base + i); acc += d * d
      }
    }
    acc
  }

  test("PqEncodeFp / AdcFp / L2Fp codegen == driver replay on 200 rows") {
    import org.apache.spark.sql.graftbridge.Bridge
    val rows = (0L until 200L).map(s => (s, qresRow(s).toSeq)).toDF("id", "qres")
    val out = rows
      .withColumn("codes", Bridge.column(PqEncodeFp(
        Bridge.expression(col("qres")), cb, m, ncw, sub)))
      .withColumn("adc", Bridge.column(AdcFp(
        Bridge.expression(col("qres")), Bridge.expression(col("codes")),
        cb, m, ncw, sub)))
      .withColumn("l2self", Bridge.column(L2Fp(
        Bridge.expression(col("qres")), Bridge.expression(col("qres")))))
      .select($"id", $"codes", $"adc", $"l2self")
      .as[(Long, Seq[Long], Long, Long)].collect()
    out.length shouldBe 200
    out.foreach { case (id, codes, adc, l2self) =>
      val q = qresRow(id)
      codes.toArray shouldBe encodeRef(q)
      adc shouldBe adcRef(q, encodeRef(q))
      l2self shouldBe 0L
    }
  }

  test("encode optimality: ADC of own codes <= ADC of any other code word") {
    (0L until 50L).foreach { s =>
      val q = qresRow(s)
      val own = adcRef(q, encodeRef(q))
      val rnd = new scala.util.Random(s)
      (1 to 10).foreach { _ =>
        val other = Array.tabulate(m)(_ => rnd.nextInt(ncw).toLong)
        own should be <= adcRef(q, other)
      }
    }
  }

  test("degenerate inputs are NULL, never a wrong number") {
    import org.apache.spark.sql.graftbridge.Bridge
    val bad = Seq(
      (1L, Seq.fill(m * sub - 1)(0L), Seq.fill(m)(0L)), // short qres
      (2L, Seq.fill(m * sub)(0L), Seq.fill(m)(ncw.toLong)) // code out of range
    ).toDF("id", "qres", "codes")
    val got = bad
      .withColumn("adc", Bridge.column(AdcFp(
        Bridge.expression(col("qres")), Bridge.expression(col("codes")),
        cb, m, ncw, sub)))
      .select($"adc").collect().map(r => r.isNullAt(0))
    got shouldBe Array(true, true)
  }

  test("PQ graph recall floor vs the exact-cosine graph (same routing)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pq = Similarity.pqKnnGraphTrainedFp(emb, k = 5, nlist = 32,
        nprobe = 4, m = 8, ncode = 32, cBudget = 40)
      .select($"q_id", $"n_id")
    val exact = Similarity.ivfKnnGraphTrainedFp(emb, k = 5, nlist = 32,
        nprobe = 4)
      .select($"q_id", $"n_id")
    val nExact = exact.count()
    val hits = pq.join(exact, Seq("q_id", "n_id")).count()
    val recall = hits.toDouble / nExact
    info(f"PQ-graph recall@5 vs exact-cos graph: $hits/$nExact = $recall%.3f")
    // m=8x32 codes + integer rerank on x2^12 residuals vs exact cosine:
    // the rank disagreement is bounded by quantization, not routing
    // (identical probed cells). Measured 0.952 at sf0.001; floor with
    // slack — a real encode/ADC defect craters this to ~k/n.
    recall should be >= 0.85
  }
}
