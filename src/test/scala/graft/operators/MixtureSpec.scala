package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The two-pass distributed prefix sum must be bit-identical to the
  * naive single-window running sum over the same deterministic order,
  * for any shard count — that equivalence is what lets the DuckDB
  * oracle check the scalable plan with the simple spelling.
  */
class MixtureSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def corpus(n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      (i.toLong * 13 + 5, Seq("en", "de", "es")(rnd.nextInt(3)), 1L + rnd.nextInt(120))
    }.toDF("id", "lang", "w")
  }

  /** Single-window reference: cum over (shard, hash, id) per stratum. */
  private def naiveCum(df: org.apache.spark.sql.DataFrame, nShards: Int) = {
    val h = Mixture.portableHash(col("id"))
    val w = Window.partitionBy(col("lang"))
      .orderBy((h % nShards).asc, h.asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col("w")).over(w))
  }

  test("portableHash Column spelling == PortableHash.family (build/probe lockstep)") {
    // d25's Bloom probe and BloomAgg's build side must hash identically;
    // pin the shared Column form to the Scala function over boundary and
    // random keys, for the Bloom members (i = 0..2, m = 65536) AND the
    // mixture members at the default modulus.
    import spark.implicits._
    val keys = (Seq(0L, 1L, 63L, 64L, 65535L, 65536L, 1000000006L,
      1000000007L, Long.MaxValue % 1000000007L) ++
      (1 to 50).map(k => k.toLong * 2654435761L % 1000000007L)).distinct
    val df = keys.toDF("x")
    for ((i, m) <- Seq((0, 65536L), (1, 65536L), (2, 65536L),
        (Mixture.OrderI, 1000000007L), (Mixture.SampleI, 1000000007L))) {
      val got = df.select(col("x"), Mixture.portableHash(col("x"), i, m).as("h"))
        .as[(Long, Long)].collect().toMap
      keys.foreach { x =>
        got(x) shouldBe graft.functions.PortableHash.family(i, x, m)
      }
    }
  }

  test("rendezvousShards: HRW minimal movement + balance (t55)") {
    import spark.implicits._
    val docs = (0L until 2000L).toDF("doc_id")
    val rows = Mixture.rendezvousShards(docs, "doc_id", k = 8, k2 = 9)
      .as[(Long, Long, Long, Boolean)].collect()
    rows.length shouldBe 2000
    // the HRW theorem: growing 8 -> 9 moves a doc ONLY to the new shard
    rows.foreach { case (_, s8, s9, moved) =>
      moved shouldBe (s8 != s9)
      if (moved) s9 shouldBe 8L
    }
    // movement ~ n/9 (loose factor-of-2 band, deterministic data)
    val nMoved = rows.count(_._4)
    nMoved should be > 2000 / 18
    nMoved should be < 2000 * 2 / 9
    // balance: every shard within 2x of the even share at k=8 —
    // assert all 8 shards are POPULATED first (an empty shard never
    // enters byShard.values and would pass the loop vacuously)
    val byShard = rows.groupBy(_._2).view.mapValues(_.length)
    byShard.size shouldBe 8
    byShard.values.foreach { n =>
      n should be > 2000 / 16
      n should be < 2000 / 4
    }
  }

  test("rendezvousShardCol == rendezvousShards argmax, per row") {
    import spark.implicits._
    val docs = (0L until 2000L).toDF("doc_id")
    val viaAgg = Mixture.rendezvousShards(docs, "doc_id", k = 8, k2 = 9)
      .select("doc_id", "shard_k", "shard_k2")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val viaCol = docs.select(col("doc_id"),
        Mixture.rendezvousShardCol(col("doc_id"), 8).as("s8"),
        Mixture.rendezvousShardCol(col("doc_id"), 9).as("s9"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    viaCol should contain theSameElementsInOrderAs viaAgg
    // and the driver/JVM spelling (asset slicing) agrees per row
    viaCol.foreach { case (id, s8, s9) =>
      Mixture.rendezvousShardOf(id, 8).toLong shouldBe s8
      Mixture.rendezvousShardOf(id, 9).toLong shouldBe s9
    }
  }

  test("rendezvousRebalance (t56): movers only, new shards only, ~1/k2 of the store") {
    import spark.implicits._
    val docs = (0L until 2000L).toDF("doc_id")
    val moves = Mixture.rendezvousRebalance(docs, "doc_id", k = 8, k2 = 9)
      .as[(Long, Long, Long)].collect()
    // shipment list == exactly the moved set of the t55 readout
    val movedIds = Mixture.rendezvousShards(docs, "doc_id", k = 8, k2 = 9)
      .filter(col("moved")).select("doc_id").as[Long].collect().toSet
    moves.map(_._1).toSet shouldBe movedIds
    // HRW: a mover goes ONLY to a new shard; from is an old shard
    moves.foreach { case (_, from, to) =>
      to shouldBe 8L
      from should be < 8L
    }
    // moved fraction ~ (k2-k)/k2 = 1/9 (loose factor-of-2 band); the
    // complement — the other ~8/9 of the store — is untouched
    moves.length should be > 2000 / 18
    moves.length should be < 2000 * 2 / 9
  }

  test("globalRunningSum == naive single-window, any shard count") {
    val df = corpus(500)
    for (nShards <- Seq(1, 3, 8)) {
      val got = Mixture.globalRunningSum(df, Seq("lang"), "id", "w", nShards)
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = naiveCum(df, nShards)
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe want
    }
  }

  test("running sum ends at the stratum total") {
    val df = corpus(300)
    val totals = df.groupBy("lang").agg(sum("w").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxCum = Mixture.globalRunningSum(df, Seq("lang"), "id", "w", 4)
      .groupBy("lang").agg(max("cum").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    maxCum shouldBe totals
  }

  test("tokenBudgetSample keeps exactly the prefix that starts under budget") {
    val df = corpus(400)
    val budget = 900L
    val sample = Mixture.tokenBudgetSample(df, Seq("lang"), "id", "w", budget, 4)
      .select("id", "lang", "w", "cum").collect()
    sample.foreach { r => (r.getLong(3) - r.getLong(2)) should be < budget }
    // complement check: every excluded doc starts at/after the budget
    val kept = sample.map(_.getLong(0)).toSet
    naiveCum(df, 4).collect().foreach { r =>
      val (id, w, cum) = (r.getLong(0), r.getLong(2), r.getLong(3))
      if (!kept.contains(id)) (cum - w) should be >= budget
    }
    // the sampled prefix covers the budget unless the stratum ran dry
    val perLang = sample.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    val stratumTotals = df.groupBy("lang").agg(sum("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, tot) =>
      assert(tot >= math.min(budget, stratumTotals(lang)))
    }
  }

  test("packSequences: offsets in range, packs contiguous, spans correct") {
    val seqLen = 100L
    val rows = Mixture.packSequences(corpus(300), Seq("lang"), "id", "w", seqLen, 4)
      .select("lang", "w", "cum", "pack_id", "pack_offset", "pack_end").collect()
    rows.foreach { r =>
      val (w, cum, pid, off, pend) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      off should (be >= 0L and be < seqLen)
      val start = cum - w
      pid shouldBe start / seqLen
      off shouldBe start % seqLen
      pend shouldBe (cum - 1) / seqLen
      pend should be >= pid
    }
    // back-to-back: within a stratum, sorted by cum, each doc starts
    // where the previous ended
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(2))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        (b.getLong(2) - b.getLong(1)) shouldBe a.getLong(2)
      }
    }
  }

  test("splitColumn is total, deterministic, and ~8/1/1") {
    import spark.implicits._
    val ids = (0L until 5000L).toDF("id")
    val counts = ids.select(Mixture.splitColumn(col("id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.values.sum shouldBe 5000L
    counts("train").toDouble / 5000 shouldBe 0.8 +- 0.05
    counts("val").toDouble / 5000 shouldBe 0.1 +- 0.03
    counts("test").toDouble / 5000 shouldBe 0.1 +- 0.03
    // rerun is identical (pure function of id)
    val again = ids.select(Mixture.splitColumn(col("id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    again shouldBe counts
  }

  test("stratifiedSample: rate-accurate, deterministic, unknown strata dropped") {
    import spark.implicits._
    val rows = (0 until 4000).map(i => (i.toLong, Seq("en", "de", "zz")(i % 3)))
      .toDF("id", "lang")
    val rates = Map("en" -> 0.5, "de" -> 0.1)
    val kept = Mixture.stratifiedSample(rows, "lang", "id", rates)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    byLang.getOrElse("zz", 0) shouldBe 0 // absent stratum dropped
    // hash is uniform: observed rate within a few points of the target
    (byLang("en").toDouble / 1334) shouldBe 0.5 +- 0.06
    (byLang("de").toDouble / 1333) shouldBe 0.1 +- 0.04
    // pure function of (id, rate): identical keep-set on a different layout
    val again = Mixture.stratifiedSample(rows.repartition(7), "lang", "id", rates)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    again.sorted shouldBe kept.sorted
    // decorrelated from the split hash: the 50% sample is NOT the train set
    val trainIds = rows.filter(Mixture.splitColumn(col("id")) === "train")
      .filter(col("lang") === "en").select("id").collect().map(_.getLong(0)).toSet
    val enKept = kept.filter(_._2 == "en").map(_._1).toSet
    enKept should not equal trainIds.take(enKept.size)
    (enKept -- trainIds) should not be empty
  }

  test("TextIndex.topTerms rank-1 matches brute force") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "b b b a"),
      (3L, "c c a a a"),
      (4L, "d")).toDF("doc_id", "text")
    val got = TextIndex.topTerms(docs, "doc_id", "text", 1)
      .select("id", "term").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // tf desc, then rarer term (df asc), then lexicographic
    got shouldBe Map(1L -> "a", 2L -> "b", 3L -> "a", 4L -> "d")
    val top2 = TextIndex.topTerms(docs, "doc_id", "text", 2)
      .filter(col("id") === 1L).orderBy("rank")
      .select("term").collect().map(_.getString(0)).toSeq
    // doc 1: a(tf2) first; b and c tie at tf 1 — b has df 2 vs c's df 2,
    // lexicographic break -> b
    top2 shouldBe Seq("a", "b")
  }

  test("temperatureMixture: sqrt flattening, clamp branch, and exact budget math") {
    import spark.implicits._
    // big domain 9000 tokens, small domain 100 tokens (90:1 natural,
    // sqrt weights 30:1 -> the small domain is over-represented)
    val docs = ((1L to 900L).map(i => (i, "big", 10L)) ++
      (1001L to 1010L).map(i => (i, "small", 10L)))
      .toDF("doc_id", "domain", "n_tok")
    val out = Mixture.temperatureMixture(docs, "domain", "doc_id",
        col("n_tok"), budgetTokens = 3100L, alpha = 0.5)
    val rates = out.select($"domain", $"rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // exact fixed-point arithmetic: w_big = round(sqrt(9000)*1e6),
    // w_small = round(sqrt(100)*1e6); rate = min(1, B*w/(wsum*tot))
    val wBig = math.round(math.sqrt(9000.0) * 1e6)
    val wSmall = math.round(math.sqrt(100.0) * 1e6)
    val wsum = (wBig + wSmall).toDouble
    rates("big") shouldBe (3100.0 * wBig / (wsum * 9000.0)) +- 1e-12
    rates("small") shouldBe 1.0 // 3100*wSmall/(wsum*100) = 2.86... -> clamps
    rates("big") should be < 1.0
    // the small domain keeps EVERYTHING (rate 1); kept fraction of the
    // big domain approximates its rate
    val kept = out.filter($"keep").groupBy($"domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    kept("small") shouldBe 10L
    kept("big").toDouble / 900.0 shouldBe rates("big") +- 0.08
    // deterministic: same input -> identical keep set
    val again = Mixture.temperatureMixture(docs, "domain", "doc_id",
        col("n_tok"), budgetTokens = 3100L, alpha = 0.5)
      .filter($"keep").select($"id").collect().map(_.getLong(0)).sorted
    out.filter($"keep").select($"id").collect().map(_.getLong(0)).sorted shouldBe again
  }
}
