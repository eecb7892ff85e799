package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract for [[Similarity.graphBeamSearch]] (s35, the DiskANN/
  * HNSW-shaped search arm).
  *
  * The exactness identity: with seedMod = 1 the navigation layer IS
  * the whole corpus, so the entry beam already holds the exact top-8
  * — expansion can only re-confirm it (scoring is exact at every
  * round) and the final read must equal brute-force top-5 row for
  * row, rank for rank. A bug in the beam fold, dedup, tie order, or
  * the final prefix read breaks the identity.
  *
  * The routed configuration (seedMod = 64, the registered s35 shape)
  * is graded on measured recall vs the same brute-force truth — the
  * graph walk must recover most of what the thin entry slice misses.
  */
class GraphAnnSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.filter($"vec_id" < 5)

  /** Exact cosine top-k per query by window rank (independent path). */
  private def bruteTruth(k: Int): Map[(Long, Long), Long] = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val dot = expr("aggregate(zip_with(q_vec, embedding, (a, b) -> a * b), 0D, (s, x) -> s + x)")
    val nrm = (c: String) =>
      expr(s"sqrt(aggregate(zip_with($c, $c, (a, b) -> a * b), 0D, (s, x) -> s + x))")
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
    broadcast(q).join(emb, $"vec_id" =!= $"q_id")
      .withColumn("cos", dot / (nrm("q_vec") * nrm("embedding")))
      .filter($"cos".isNotNull)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"q_id", $"vec_id", $"rnk".cast("long"))
      .as[(Long, Long, Long)].collect()
      .map { case (q0, n, r) => (q0, n) -> r }.toMap
  }

  test("seedMod=1 beam search IS brute-force top-k (exactness identity)") {
    val truth = bruteTruth(5)
    val got = Similarity.graphBeamSearch(emb, queries, k = 5,
        beam = 8, rounds = 2, seedMod = 1)
      .select($"q_id", $"n_id", $"rnk")
      .as[(Long, Long, Long)].collect()
      .map { case (q0, n, r) => (q0, n) -> r }.toMap
    got shouldBe truth
  }

  test("registered routed config: 5 ranked rows per query, measured recall floor") {
    val truth = bruteTruth(5)
    val rows = Similarity.graphBeamSearchScaled(emb, queries, k = 5,
        beam = 16, rounds = 3, seedMod = 64, graphK = 10,
        undirected = true)
      .select($"q_id", $"n_id", $"rnk", $"cos_sim")
      .as[(Long, Long, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      rs.map(_._3).sorted shouldBe (1L to 5L) // dense ranks per query
      // cos non-increasing in rank
      rs.sortBy(_._3).map(_._4).sliding(2).foreach {
        case Array(a, b) => a should be >= b
        case _           =>
      }
    }
    val hit = rows.count { case (q0, n, _, _) => truth.contains((q0, n)) }
    val recall = hit.toDouble / truth.size
    // GraphAnnProbe (sf0.01, 50 queries): 0.868 at this config; the
    // sf0.001 corpus is 10x smaller with only 5 queries, so the floor
    // is loose — the sweep evidence lives in PLANS.md
    info(f"recall@5 (graphK=10 undirected, seedMod=64, beam=16, rounds=3) = $recall%.3f")
    recall should be >= 0.6
  }
}
