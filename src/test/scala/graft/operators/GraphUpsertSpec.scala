package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** d26's contract, pinned ENGINE-SIDE (the oracle pins it against
  * DuckDB's batch spelling): the incremental merge-upsert dataflow —
  * frozen base-trained quantizer, arriving shard routed/merged, stored
  * base top-k folded with the new candidate pairs — equals the batch
  * rebuild over the same frozen quantizer ROW FOR ROW. The equality is
  * exact, not approximate: top-k(C_base ∪ C_new) = top-k(top-k(C_base)
  * ∪ C_new) under the bounded aggregator's (cos desc, id asc) order.
  */
class GraphUpsertSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"q_id", $"rnk".cast("long"), $"n_id", $"cos_sim")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))

  test("incremental merge-upsert == batch rebuild on the frozen quantizer") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.filter($"vec_id" % 10 =!= 7)
    val arriving = emb.filter($"vec_id" % 10 === 7)
    val inc = rows(Similarity.knnGraphIncrementalFp(base, arriving, k = 5))
    // batch arm: same frozen geometry/quantizer, one full rebuild
    val trained = Similarity.ivfTrainCentroidsFp(base,
      Similarity.scaledNlist(base.count()), hashSeed = true)
    val (sr, cr) = Similarity.firstNsSuperTable(trained,
      Similarity.scaledSuperList(trained.length))
    val routed = Similarity.twoLevelRouted(emb, sr, cr, nprobe = 4,
      superProbe = 3, idCol = "vec_id", vecCol = "embedding",
      scope = CacheScope.sessionScope(spark))
    val batch = rows(Similarity.knnGraphTailFromRouted(routed, 5))
    inc.length shouldBe batch.length
    inc should contain theSameElementsInOrderAs batch
    // and every vector (base + arriving) carries a full top-5
    inc.map(_._1).distinct.length shouldBe emb.count()
  }

  test("st61 partials fold losslessly to st53's global intents") {
    val dir = "/root/testdata/sf0.001"
    val global = graft.streaming.Streaming.streamGraphUpsert(spark, dir)
      .select($"kind", $"q_id", $"n_id", $"rnk".cast("long"), $"cos_sim")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getDouble(4)))
    val partials = graft.streaming.Streaming
      .streamShardedGraphUpsert(spark, dir, nOwners = 4)
      .select($"kind", $"owner", $"q_id", $"n_id", $"cos_sim")
      .as[(String, Long, Long, Long, Double)].collect()
    // upserts: per-owner emission is already exact — same rows
    val upG = global.filter(_._1 == "upsert").map(r => (r._2, r._3, r._5)).sorted
    val upP = partials.filter(_._1 == "upsert").map(r => (r._3, r._4, r._5)).sorted
    upP should contain theSameElementsInOrderAs upG.toSeq
    // new_topk: the merger's top-5 of the unioned per-owner partials
    // (cos DESC, id ASC) equals st53's global top-5, row for row
    val ntG = global.filter(_._1 == "new_topk")
      .map(r => (r._2, r._4, r._3, r._5)).sorted
    val ntP = partials.filter(_._1 == "new_topk")
      .groupBy(_._3).toSeq.flatMap { case (q, rows) =>
        rows.map(r => (r._4, r._5)).distinct
          .sortBy { case (id, c) => (-c, id) }.take(5)
          .zipWithIndex.map { case ((id, c), i) => (q, (i + 1).toLong, id, c) }
      }.sorted
    ntP should contain theSameElementsInOrderAs ntG.toSeq
  }

  test("degenerate shards: empty arrivals == the base build; empty base == empty graph") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val none = emb.filter($"vec_id" < 0)
    // no arrivals: the merge is exactly the frozen base graph
    val incNone = rows(Similarity.knnGraphIncrementalFp(emb, none, k = 5))
    val baseOnly = rows(Similarity.knnGraphScaledFp(emb, k = 5))
    incNone should contain theSameElementsInOrderAs baseOnly
    // no base: nothing to freeze an index on — empty output, no throw
    Similarity.knnGraphIncrementalFp(none, emb, k = 5).count() shouldBe 0L
    Similarity.knnGraphScaledFp(none, k = 5).count() shouldBe 0L
    Similarity.pqKnnGraphScaledFp(none, k = 5).count() shouldBe 0L
  }
}
