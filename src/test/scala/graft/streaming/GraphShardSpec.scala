package graft.streaming

import graft.operators.{CacheScope, Mixture, Similarity, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** st58's contract, pinned ENGINE-SIDE (the oracle pins it against
  * DuckDB's per-shard replay): the shard-composed serving stream —
  * rendezvous-sharded corpus, per-shard graph assets, queries routed
  * by their own key's shard, walks confined to one shard's replica —
  * equals nShards independent batch beam searches over the shard
  * slices, row for row. Plus the two properties that make it the
  * 100 TB answer: every replica is bounded by ~corpus/nShards, and
  * every result row really was served by its query's rendezvous
  * shard.
  */
class GraphShardSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val nShards = 4

  test("sharded stream serving == per-shard batch beam search") {
    val got = Streaming.streamShardedGraphProbe(spark, dir, nShards = nShards)
      .select($"q_id", $"shard", $"rnk".cast("long"), $"n_id", $"cos_sim")
      .as[(Long, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._3))

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long").as("vec_id"), $"embedding")
    val queries = emb.select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val want = (0 until nShards).flatMap { sh =>
      val shardCorpus = emb.filter(
        Mixture.rendezvousShardCol($"vec_id", nShards) === sh)
      val routed = queries.filter(
        Mixture.rendezvousShardCol($"vec_id", nShards) === sh)
      val graph = Similarity.knnEdgesScaled(shardCorpus, graphK = 10,
        undirected = true).persist()
      val rows = Similarity.graphBeamSearchOver(graph, shardCorpus, routed,
          k = 5, beam = 16, rounds = 3, seedMod = 64)
        .select($"q_id", $"rnk".cast("long"), $"n_id", $"cos_sim")
        .as[(Long, Long, Long, Double)].collect()
        .map { case (q, rnk, n, c) => (q, sh.toLong, rnk, n, c) }
      graph.unpersist()
      CacheScope.releaseSession(spark)
      rows
    }.sortBy(r => (r._1, r._3))

    got.length shouldBe want.length
    got should contain theSameElementsInOrderAs want
  }

  test("st60: sharded + intent-masked serving returns no tombstoned id, full k") {
    val got = Streaming.streamShardedTakedownServing(spark, dir,
        nShards = nShards)
      .select($"q_id", $"shard", $"rnk".cast("long"), $"n_id")
      .as[(Long, Long, Long, Long)].collect()
    got should not be empty
    // masked ids (vec_id % 10 == 3, the st54 notice filter) can never
    // be returned; ranks stay a contiguous 1..m prefix per query
    got.foreach { case (_, _, _, n) => (n % 10) should not be 3L }
    got.groupBy(_._1).values.foreach { rows =>
      rows.map(_._3).sorted shouldBe (1L to rows.length)
    }
    // routing still honored under the mask
    val expect = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(($"vec_id".cast("long") + 100000L).as("q_id"))
      .select($"q_id", Mixture.rendezvousShardCol($"q_id", nShards).as("s"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (q, sh, _, _) => sh shouldBe expect(q) }
  }

  test("per-shard replica is bounded and routing is honored") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long").as("vec_id"))
    val n = emb.count()
    // replica bound: every shard within 2x of the even share (and all
    // populated) — the O(corpus/nShards) contract st50 lacks
    val sizes = emb
      .groupBy(Mixture.rendezvousShardCol($"vec_id", nShards).as("shard"))
      .count().as[(Long, Long)].collect().toMap
    sizes.size shouldBe nShards
    sizes.values.foreach { c =>
      c should be < 2L * n / nShards
      c should be > n / (2L * nShards)
    }
    // routing honored: each output row's shard == its query's argmax
    val rows = Streaming.streamShardedGraphProbe(spark, dir, nShards = nShards)
      .select($"q_id", $"shard").distinct()
      .as[(Long, Long)].collect()
    val expect = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(($"vec_id".cast("long") + 100000L).as("q_id"))
      .select($"q_id", Mixture.rendezvousShardCol($"q_id", nShards).as("s"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (q, sh) => sh shouldBe expect(q) }
  }
}
