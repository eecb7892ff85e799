package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Distributed large-star/small-star connected components vs the exact
  * driver union-find, plus a graph big enough that collecting it is the
  * wrong design (1M edges, diameter 1000) run through the distributed
  * path only (driverMaxEdges = 0).
  */
class ConnectedComponentsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val uf = new graft.core.UnionFind[Long]
    edges.foreach { case (a, b) => uf.union(a, b) }
    uf.elements.toSeq.groupBy(uf.find).iterator.flatMap { case (_, ms) =>
      val root = ms.min
      ms.map(_ -> root)
    }.toMap
  }

  test("distributed path matches union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + trial * 25
      val edges = (0 until n * 2).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(p => p._1 != p._2)
      val got = ConnectedComponents
        .componentMap(edges.toDF("a", "b"), driverMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe ufComponents(edges)
    }
  }

  test("assign maps isolated nodes to themselves") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val got = ConnectedComponents.assign(edges, nodes, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L)
  }

  test("empty edge set yields empty map and self-assignment") {
    import spark.implicits._
    val edges = spark.emptyDataset[(Long, Long)].toDF("a", "b")
    ConnectedComponents.componentMap(edges, driverMaxEdges = 0L).count() shouldBe 0L
    val nodes = Seq(5L, 6L).toDF("id")
    ConnectedComponents.assign(edges, nodes, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(5L -> 5L, 6L -> 6L)
  }

  test("1M-edge chain forest resolves distributed (no driver collect)") {
    import spark.implicits._
    // 1000 chains of 1001 nodes each: node i links to i+1000, so chain
    // c = {c, c+1000, ..., c+1000*1000} and every component's min is its
    // residue c. Diameter 1000 exercises the O(log) round convergence —
    // label propagation would need 1000 rounds, this needs ~15.
    val edges = spark.range(0L, 1000000L)
      .select(col("id").as("a"), (col("id") + 1000L).as("b"))
    val comp = ConnectedComponents.componentMap(edges, driverMaxEdges = 0L)
    comp.count() shouldBe 1001000L
    comp.filter(col("component") =!= col("id") % 1000).count() shouldBe 0L
  }
}
