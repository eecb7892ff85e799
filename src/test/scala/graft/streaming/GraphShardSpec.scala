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

  test("st62: resize serving == masked old arms + fresh mover-sliver arm") {
    val kFrom = 4; val kTo = 5
    val got = Streaming.streamShardResizeServing(spark, dir,
        kFrom = kFrom, kTo = kTo)
      .select($"q_id", $"shard", $"rnk".cast("long"), $"n_id", $"cos_sim")
      .as[(Long, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._3))

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long").as("vec_id"), $"embedding")
    val queries = emb.select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val want = (0 until kTo).flatMap { sh =>
      // graph corpus: old shards = the kFrom slice (asset layout),
      // new shard = its kTo mover sliver; SCORING is the kTo slice
      // for everyone (old shards' movers masked)
      val buildSlice =
        if (sh < kFrom)
          emb.filter(Mixture.rendezvousShardCol($"vec_id", kFrom) === sh)
        else emb.filter(Mixture.rendezvousShardCol($"vec_id", kTo) === sh)
      val scoreSlice = emb.filter(
        Mixture.rendezvousShardCol($"vec_id", kTo) === sh)
      val routed = queries.filter(
        Mixture.rendezvousShardCol($"vec_id", kTo) === sh)
      val graph = Similarity.knnEdgesScaled(buildSlice, graphK = 10,
        undirected = true).persist()
      val rows = Similarity.graphBeamSearchOver(graph, scoreSlice, routed,
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
    // no mover is ever returned by an old-shard arm (it moved)
    got.foreach { case (_, sh, _, n, _) =>
      if (sh < kFrom)
        Mixture.rendezvousShardOf(n, kTo).toLong shouldBe sh
    }
  }

  test("st62: resize reuses old assets byte-for-byte, builds only movers") {
    val kFrom = 4; val kTo = 5
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long").as("vec_id"))
    // HRW stability: growing the fleet can only move an id TO a new
    // shard — so the mover set IS the new shard's kTo slice, and every
    // old shard's kTo slice is its kFrom slice minus its movers
    val shards = emb.select($"vec_id",
        Mixture.rendezvousShardCol($"vec_id", kFrom).as("from_s"),
        Mixture.rendezvousShardCol($"vec_id", kTo).as("to_s"))
      .as[(Long, Long, Long)].collect()
    shards.foreach { case (_, f, t) =>
      if (t < kFrom) t shouldBe f // stayed put, same argmax
      else t shouldBe (kTo - 1).toLong // moved, only to the new member
    }
    // moved fraction ~ 1/kTo (rendezvous guarantee; loose 2x bounds)
    val moved = shards.count { case (_, f, t) => f != t }
    moved.toDouble / shards.length should be > 0.5 / kTo
    moved.toDouble / shards.length should be < 2.0 / kTo
    // the old shards' stored assets are NOT touched by the resize run:
    // pre-build them (st58's fleet), snapshot mtimes, serve the
    // resize, and require the kFrom-layout markers unchanged
    (0 until kFrom).foreach { sh =>
      Similarity.ensureShardKnnIndex(spark, dir, kFrom, sh)
    }
    def mtimes(): Seq[Long] = (0 until kFrom).map { sh =>
      new java.io.File(graft.operators.Assets.assetPath(spark,
        Similarity.shardIndexName(dir, kFrom, sh, 10, 64, 4, 3)))
        .lastModified()
    }
    val before = mtimes()
    before.foreach(_ should be > 0L)
    Streaming.streamShardResizeServing(spark, dir, kFrom = kFrom, kTo = kTo)
      .count() should be > 0L
    mtimes() shouldBe before
  }

  test("st63: failover serves gained orphans via the seed layer, zero builds") {
    val kFrom = 5; val kTo = 4
    // pre-build the pre-failover fleet's assets (the nightly job that
    // ran BEFORE the node died), snapshot, and require the serve not
    // to touch them
    (0 until kTo).foreach { sh =>
      Similarity.ensureShardKnnIndex(spark, dir, kFrom, sh)
    }
    def mtimes(): Seq[Long] = (0 until kTo).map { sh =>
      new java.io.File(graft.operators.Assets.assetPath(spark,
        Similarity.shardIndexName(dir, kFrom, sh, 10, 64, 4, 3)))
        .lastModified()
    }
    val before = mtimes()
    before.foreach(_ should be > 0L)

    val got = Streaming.streamShardFailoverServing(spark, dir, kFrom = kFrom)
      .select($"q_id", $"shard", $"rnk".cast("long"), $"n_id", $"cos_sim")
      .as[(Long, Long, Long, Long, Double)].collect()
    got should not be empty
    mtimes() shouldBe before

    // ownership: every returned id lives in its arm's surviving slice
    got.foreach { case (_, sh, _, n, _) =>
      Mixture.rendezvousShardOf(n, kTo).toLong shouldBe sh
    }
    // routing: each query served by its own surviving-layout argmax
    got.foreach { case (q, sh, _, _, _) =>
      Mixture.rendezvousShardOf(q, kTo).toLong shouldBe sh
    }
    // the dead shard's keys are ORPHANS in the stored graphs (no
    // edges), so any one of them in a result witnesses the seed-layer
    // widening; a query that lands in its own vector's arm must find
    // it at rank 1 with cosine 1
    val orphans = got.filter { case (_, _, _, n, _) =>
      Mixture.rendezvousShardOf(n, kFrom) == kFrom - 1
    }
    orphans should not be empty
    val selfFinds = got.filter { case (q, sh, _, _, _) =>
      val own = q - 100000L
      Mixture.rendezvousShardOf(own, kFrom) == kFrom - 1 &&
        Mixture.rendezvousShardOf(own, kTo).toLong == sh
    }
    selfFinds should not be empty
    selfFinds.groupBy(_._1).foreach { case (q, rows) =>
      val top = rows.minBy(_._3)
      top._4 shouldBe (q - 100000L)
      top._5 shouldBe 1.0 +- 1e-9
    }
  }

  test("st64: routed scatter-gather == top-m routed walks merged exactly") {
    val nSh = 4; val m = 2; val k = 5
    val got = Streaming.streamScatterGatherServing(spark, dir,
        nShards = nSh, probeShards = m, k = k)
      .select($"q_id", $"rnk".cast("long"), $"n_id", $"cos_sim", $"shard")
      .as[(Long, Long, Long, Double, Long)].collect()
      .sortBy(r => (r._1, r._2))
    got should not be empty

    // batch composition: the same router (max cosine vs each shard's
    // vec_id%64 slice, ties -> low shard), per-shard batch beam
    // search over the routed queries, exact merge
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long").as("vec_id"), $"embedding")
    val all = emb.as[(Long, Array[Float])].collect()
    val byShard = all.groupBy { case (id, _) =>
      Mixture.rendezvousShardOf(id, nSh) }
    val router: Map[Int, Array[Array[Float]]] = byShard.map {
      case (sh, rows) =>
        (sh, rows.filter(_._1 % 64 == 0).sortBy(_._1).map(_._2))
    }
    def topShards(qv: Array[Float]): Seq[Int] =
      (0 until nSh).flatMap { sh =>
        val scores = router.getOrElse(sh, Array.empty).iterator
          .map(v => Streaming.cosExact(qv, v)).filter(!_.isNaN).toSeq
        if (scores.isEmpty) None else Some((sh, scores.max))
      }.sortBy { case (sh, sc) => (-sc, sh) }.take(m).map(_._1)
    val routedTo: Map[Int, Seq[Long]] = all
      .flatMap { case (id, v) => topShards(v).map(sh => (sh, id + 100000L)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val partials = (0 until nSh).flatMap { sh =>
      val qIds = routedTo.getOrElse(sh, Seq.empty)
      if (qIds.isEmpty) Seq.empty else {
        val shardCorpus = emb.filter(
          Mixture.rendezvousShardCol($"vec_id", nSh) === sh)
        val routed = emb.filter(($"vec_id" + 100000L).isin(qIds: _*))
          .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
        val graph = Similarity.knnEdgesScaled(shardCorpus, graphK = 10,
          undirected = true).persist()
        val rows = Similarity.graphBeamSearchOver(graph, shardCorpus, routed,
            k = k, beam = 16, rounds = 3, seedMod = 64)
          .select($"q_id", $"n_id", $"cos_sim")
          .as[(Long, Long, Double)].collect()
          .map { case (q, n, c) => (q, sh.toLong, n, c) }
        graph.unpersist()
        CacheScope.releaseSession(spark)
        rows
      }
    }
    val want = partials.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
      rows.sortBy { case (_, _, n, c) => (-c, n) }.take(k).zipWithIndex
        .map { case ((_, sh, n, c), i) => (q, (i + 1).toLong, n, c, sh) }
    }.sortBy(r => (r._1, r._2))

    got.length shouldBe want.length
    got should contain theSameElementsInOrderAs want
    // the scatter is bounded: every query's results span <= m shards
    got.groupBy(_._1).values.foreach { rows =>
      rows.map(_._5).distinct.length should be <= m
    }
  }

  test("s47: distributed batch scatter-gather == st64 stream row for row") {
    val got = Streaming.streamScatterGatherServing(spark, dir,
        nShards = 4, probeShards = 2, k = 5)
      .select($"q_id", $"rnk".cast("long"), $"n_id", $"cos_sim", $"shard")
      .as[(Long, Long, Long, Double, Long)].collect()
      .sortBy(r => (r._1, r._2))
    // the batch twin over the SAME query set (the +100000 arrivals)
    val qs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(($"vec_id".cast("long") + 100000L).as("vec_id"), $"embedding")
    val want = Similarity.scatterGatherTopK(spark, dir, qs,
        nShards = 4, probeShards = 2, k = 5)
      .select($"q_id", $"rnk".cast("long"), $"n_id", $"cos_sim", $"shard")
      .as[(Long, Long, Long, Double, Long)].collect()
      .sortBy(r => (r._1, r._2))
    got.length shouldBe want.length
    got should contain theSameElementsInOrderAs want
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
