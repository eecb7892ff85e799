package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class KmvAggSpec extends AnyFunSuite with Matchers {

  private lazy val spark = graft.operators.TestSpark.spark
  private val P = 1000000007L

  // large-multiplier member of the portable family (KmvAgg's contract)
  private def hash(x: Long): Long = (736238393L * (x % P) + 12345L) % P

  private def estimate(values: Seq[Long], k: Int, parts: Int): Double = {
    import spark.implicits._
    spark.createDataset(values.map(hash)).repartition(parts)
      .groupByKey(_ => 0)
      .agg(new KmvAgg(k).toColumn.name("e"))
      .collect().head._2
  }

  test("exact when distinct count below k") {
    val vs = (0L until 20L) ++ (0L until 20L) // duplicates collapse
    estimate(vs, k = 32, parts = 8) shouldBe 20.0
  }

  test("partitioning-invariant (deterministic merge)") {
    val vs = (0L until 5000L).map(_ * 13 + 7)
    val e1 = estimate(vs, k = 64, parts = 1)
    val e32 = estimate(vs, k = 64, parts = 32)
    e1 shouldBe e32 // bit-identical, not approximately equal
  }

  test("estimate within 3/sqrt(k) of truth on uniform-ish ids") {
    val n = 20000
    val vs = (0L until n.toLong).map(_ * 1009 + 3)
    val k = 256
    val e = estimate(vs, k, parts = 16)
    math.abs(e - n) / n should be < (3.0 / math.sqrt(k))
  }

  test("sketch algebra: merging two sketches equals the union's sketch (t33's identity)") {
    val agg = new KmvSketchAgg(64)
    val a = (0L until 3000L).map(x => hash(x * 17 + 1))
    val b = (0L until 3000L).map(x => hash(x * 29 + 5))
    val skA = a.foldLeft(agg.zero)(agg.reduce)
    val skB = b.foldLeft(agg.zero)(agg.reduce)
    val skU = (a ++ b).foldLeft(agg.zero)(agg.reduce)
    agg.merge(skA, skB).toSeq shouldBe skU.toSeq
  }

  test("bottom-k Jaccard estimate tracks true Jaccard on planted overlap") {
    // A and B share exactly their first 2000 elements: true J = 1/3
    val shared = (0L until 2000L).map(_ * 7 + 3)
    val a = shared ++ (0L until 2000L).map(_ * 11 + 100000000L)
    val b = shared ++ (0L until 2000L).map(_ * 13 + 200000000L)
    val k = 256
    val agg = new KmvSketchAgg(k)
    val skA = a.map(hash).foldLeft(agg.zero)(agg.reduce)
    val skB = b.map(hash).foldLeft(agg.zero)(agg.reduce)
    val mg = agg.merge(skA, skB) // bottom-k of the union
    val both = mg.count(h => skA.contains(h) && skB.contains(h))
    val jacc = both.toDouble / mg.length
    math.abs(jacc - 1.0 / 3) should be < (3.0 / math.sqrt(k))
  }

  test("reduce keeps the k smallest distinct hashes in order") {
    val agg = new KmvAgg(4)
    val buf = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L).foldLeft(agg.zero)(agg.reduce)
    buf.toSeq shouldBe Seq(1L, 2L, 3L, 7L)
    val merged = agg.merge(buf, Array(0L, 2L, 5L))
    merged.toSeq shouldBe Seq(0L, 1L, 2L, 3L)
  }
}
