package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Fixed-point PageRank contract: integer-exact replay (any
  * aggregation order), damped power-iteration semantics, and the
  * deterministic synthetic link graph's degree invariant.
  */
class GraphSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Driver-side replay with identical integer arithmetic. */
  private def replay(n: Int, edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val base = Scale * 15 / 100 / n
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = (0L until n).map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outDeg(s) }.sum
      }
      r = (0L until n).map(v => v -> (base + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  test("two-node cycle settles symmetric; rank mass is conserved up to truncation") {
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val out = Graph.pageRankFixedPoint(nodes, edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(0L) shouldBe out(1L)
    val total = out.values.sum
    total should be <= Scale
    total should be > (Scale * 99 / 100) // truncation loses < 1%
  }

  test("driver replay matches the distributed iteration exactly") {
    val n = 40
    val edges = (0L until n).flatMap { v =>
      (1 to 3).map(j => v -> ((v + j) * 2654435761L % 1000003L % n))
    }
    val out = Graph.pageRankFixedPoint(
        (0L until n).toDF("id"), edges.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe replay(n.toInt, edges, 5)
  }

  test("a hub every node links to outranks the spokes") {
    val n = 10L
    val nodes = (0L until n).toDF("id")
    // spokes 1..9 all link to hub 0; hub links to node 1
    val edges = ((1L until n).map(_ -> 0L) :+ (0L -> 1L)).toDF("src", "dst")
    val out = Graph.pageRankFixedPoint(nodes, edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (2L until n).foreach { v => out(0L) should be > out(v) }
  }

  // ---- label propagation (q77) ----

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).toDF("u", "v")

  test("LPA: barbell splits into two communities where CC sees one component") {
    // two 4-cliques {0..3} and {10..13} joined by the bridge 3-10
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (3L -> 10L)
    val nodes = (Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L)).toDF("id")
    val out = Graph.labelPropagation(nodes, sym(edges), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(0L, 1L, 2L, 3L).map(out) shouldBe Seq(0L, 0L, 0L, 0L)
    Seq(10L, 11L, 12L, 13L).map(out) shouldBe Seq(10L, 10L, 10L, 10L)
    // same edges, one connected component — LPA is strictly finer
    val cc = ConnectedComponents.assign(
        edges.toDF("src", "dst"), nodes, driverMaxEdges = 0L)
      .select($"component").distinct().count()
    cc shouldBe 1L
  }

  test("LPA: isolated node keeps its own label; tie-break is smallest label") {
    val nodes = Seq(0L, 1L, 2L, 99L).toDF("id")
    // path 0-1-2: node 1 sees labels {0, 2} once each -> adopts 0
    val out = Graph.labelPropagation(nodes, sym(Seq((0L, 1L), (1L, 2L))),
        rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe 0L
    out(99L) shouldBe 99L
  }

  test("LPA: deterministic across runs") {
    val nodes = (0L until 30L).toDF("id")
    val edges = (0L until 30L).flatMap { v =>
      (1 to 2).map(j => v -> ((v * 7 + j * 13) % 30))
    }.filter { case (a, b) => a != b }
    def run() = Graph.labelPropagation(nodes, sym(edges), rounds = 3)
      .orderBy("id").collect().toSeq
    run() shouldBe run()
  }

  test("syntheticLinks: fanout edges per node, dst in [0, n), deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val e = Graph.syntheticLinks(docs, "doc_id", n, fanout = 3)
    e.count() shouldBe 3 * n
    e.groupBy("src").count().filter($"count" =!= 3).count() shouldBe 0
    e.filter($"dst" < 0 || $"dst" >= n).count() shouldBe 0
    val a = e.orderBy("src", "dst").collect().toSeq
    val b = Graph.syntheticLinks(docs, "doc_id", n, fanout = 3)
      .orderBy("src", "dst").collect().toSeq
    a shouldBe b
  }
}
