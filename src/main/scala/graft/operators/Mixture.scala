package graft.operators

import graft.functions.{PortableHash, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic splits, token-budget
  * mixture sampling, and fixed-length sequence packing — the stages that
  * turn a deduplicated corpus into model-ready data.
  *
  * All order-dependent operators run over a *deterministic pseudo-random
  * order*: documents are sorted by the engine's portable integer hash of
  * their id ([[graft.functions.PortableHash]], the same family the
  * MinHash/Bloom sketches and their DuckDB oracles share). That makes
  * every sample/pack reproducible across runs, engines, and cluster
  * sizes — a hard requirement for training-data lineage.
  *
  * 100 TB design: the global running sum that sampling and packing need
  * is NOT computed with a single `Window.partitionBy(stratum)` (that
  * would sort each stratum in one task — a scale-killer when one
  * language is 40 TB). [[globalRunningSum]] is the classic two-pass
  * distributed prefix sum:
  *
  *   1. shard rows by hash into `nShards` groups per stratum; compute
  *      the running sum *within* each (stratum, shard) — parallelism =
  *      |strata| × nShards, one ordinary window sort per shard;
  *   2. aggregate one total per (stratum, shard) — a tiny table —
  *      take the exclusive prefix over shards (driver-scale window),
  *      and broadcast-join it back: global = shard prefix + local
  *      running sum.
  *
  * The result is bit-identical to the naive single-partition window
  * ordered by (shard, hash, id) — which is exactly what the DuckDB
  * oracle runs — while every heavy step stays fully parallel.
  */
object Mixture {

  val DefaultMod: Long = 1000000007L

  /** Default family member for ordering/shard/split. A SMALL member
    * (e.g. i=1 → h = 3·id + 8) is strictly monotone in id for ids below
    * mod/3 (~333M), so "pseudo-random order" would degenerate to id
    * order and the 8/1/1 split to a residue-class split on sequential
    * id domains. This member's multiplier 2i+1 = 736238393 (the same
    * one the KMV sketch uses) wraps mod 1e9+7 every ~1.36 ids, so even
    * dense sequential ids scramble. Assumes integral ids; extremely
    * structured id domains (e.g. all ids ≡ 0 mod 1e9+7) would still
    * collide, as with any single linear hash.
    */
  val OrderI: Int = 368119196 // 2*i+1 = 736238393

  /** Column form of [[PortableHash.family]]: h_i(x) = ((2i+1)·x + i² + 7) mod m. */
  def portableHash(id: Column, i: Int = OrderI, mod: Long = DefaultMod): Column =
    (lit(2L * i + 1) * (id % mod) + lit(i.toLong * i + 7L)) % mod

  /** SQL spelling of [[portableHash]] for DuckDB oracles. */
  def portableHashSql(id: String, i: Int = OrderI, mod: Long = DefaultMod): String =
    s"((${2L * i + 1}*($id % $mod)) + ${i.toLong * i + 7L}) % $mod"

  /** Member-index stride for [[rendezvousWeight]]'s per-shard family
    * members: adjacent raw indices (multipliers differing by 2) are
    * heavily correlated under the linear family — measured shard
    * counts 55..209 for k=8 over 1000 sequential ids — so shard s maps
    * to member OrderI + s·77003 and the weight applies the family
    * TWICE (outer member OrderI). Measured: counts 115..135 for k=8 /
    * 1000 ids, movement k=8→9 within 3% of the ideal 1/9, zero
    * moved-not-to-the-new-shard violations.
    */
  val RendezvousStep: Long = 77003L

  /** Largest shard count the exact-bigint weight supports: the member
    * index i = OrderI + s·RendezvousStep must stay ≤ ~2^31 so i² and
    * (2i+1)·(x mod m) both stay below 2^63. Past this bound Spark's
    * Long arithmetic wraps SILENTLY while DuckDB's bigint throws — the
    * engine and the oracle would diverge instead of failing together.
    */
  val MaxShards: Int =
    ((Int.MaxValue.toLong - OrderI.toLong) / RendezvousStep).toInt // 23108

  private[graft] def requireShardBound(k2: Int): Unit =
    require(k2 <= MaxShards,
      s"shard count $k2 exceeds MaxShards=$MaxShards (member index " +
        "would overflow the exact-bigint rendezvous weight)")

  /** Rendezvous (HRW) weight of `id` for shard `s`: the double-applied
    * portable family, exact bigint arithmetic — no overflow for
    * i ≤ ~2^31 (i² ≈ 1.4e17, (2i+1)·(x mod m) ≈ 7.4e17, both < 2^63).
    */
  def rendezvousWeight(id: Column, s: Column,
      mod: Long = DefaultMod): Column = {
    val i = lit(OrderI.toLong) + s.cast("long") * lit(RendezvousStep)
    val inner = ((lit(2L) * i + lit(1L)) * (id % mod) + i * i + lit(7L)) % mod
    portableHash(inner, OrderI, mod)
  }

  /** SQL spelling of [[rendezvousWeight]]. */
  def rendezvousWeightSql(id: String, s: String,
      mod: Long = DefaultMod): String = {
    val i = s"(${OrderI.toLong} + $s * $RendezvousStep)"
    val inner = s"((2*$i + 1) * ($id % $mod) + $i*$i + 7) % $mod"
    portableHashSql(s"($inner)", OrderI, mod)
  }

  /** The HRW shard of `id` among `k` shards as a PURE per-row column
    * expression (the argmax folds over a literal shard array via
    * array_max on (w, −s, s) structs — Spark's lexicographic struct
    * order IS the ties-to-lowest-s rule). Stateless, shuffle-free,
    * codegen'd: what a 100 TB ingest tier computes per record before
    * writing, and what a serving tier computes per query to pick its
    * replica.
    */
  def rendezvousShardCol(id: Column, k: Int): Column = {
    require(k >= 1, s"need k >= 1, got $k")
    requireShardBound(k)
    val arr = transform(sequence(lit(0), lit(k - 1)), sc =>
      struct(rendezvousWeight(id, sc).as("w"),
        (-sc.cast("long")).as("neg"), sc.cast("long").as("s")))
    array_max(arr)("s")
  }

  /** Driver/JVM spelling of [[rendezvousShardCol]] — for slicing
    * build-once assets by owner at planning time (MixtureSpec pins it
    * equal to the Column argmax per row).
    */
  def rendezvousShardOf(id: Long, k: Int): Int = {
    require(k >= 1, s"need k >= 1, got $k")
    requireShardBound(k)
    val m = DefaultMod
    var best = 0L; var bestW = Long.MinValue
    var s = 0
    while (s < k) {
      val i = OrderI.toLong + s * RendezvousStep
      // sign-faithful to the Column spelling (Spark's % keeps sign);
      // ids here are non-negative in practice
      val inner = ((2L * i + 1L) * (id % m) + i * i + 7L) % m
      val w = graft.functions.PortableHash.family(OrderI, inner, m)
      if (w > bestW) { bestW = w; best = s } // strict >: ties to lowest s
      s += 1
    }
    best.toInt
  }

  /** Scalar SQL spelling of [[rendezvousShardCol]] for DuckDB oracles:
    * an unrolled CASE — shard s wins iff its weight is >= every LATER
    * shard's weight and no earlier shard already won, which picks the
    * lowest argmax exactly like the struct-max tie rule.
    */
  def rendezvousShardSql(id: String, k: Int): String = {
    require(k >= 1, s"need k >= 1, got $k")
    requireShardBound(k)
    if (k == 1) "cast(0 as bigint)"
    else {
      // shard literals spelled as bigint: an int32 literal would make
      // the member index i int32 and overflow i*i in DuckDB
      val ws = (0 until k).map(s =>
        s"(${rendezvousWeightSql(id, s"cast($s as bigint)")})")
      (0 until k - 1).map { s =>
        val conds = (s + 1 until k).map(t => s"${ws(s)} >= ${ws(t)}")
          .mkString(" AND ")
        s"WHEN $conds THEN $s"
      }.mkString("(cast(CASE ", " ", s" ELSE ${k - 1} END as bigint))")
    }
  }

  /** SHARD-RESIZE SHIPMENT LIST — the operator that executes a k → k2
    * resize at 100 TB: emit (doc_id, from_shard, to_shard) for ONLY
    * the docs the HRW theorem moves (their old argmax is beaten by a
    * NEW shard, so to_shard ∈ [k, k2) always), leaving the other
    * ~k/k2 of the store untouched — no reshuffle, no read of the
    * resident shards.
    *
    * Spark shape: one scan, two per-row [[rendezvousShardCol]]
    * projections, one filter — map-only, zero shuffles, zero joins;
    * the output is the ~(k2−k)/k2 sliver a mover job ships. The
    * DuckDB oracle replays the exact integer weights and both
    * argmaxes and keeps only the movers.
    */
  def rendezvousRebalance(docs: DataFrame, idCol: String,
      k: Int, k2: Int): DataFrame = {
    require(1 <= k && k < k2, s"need 1 <= k < k2, got k=$k k2=$k2")
    requireShardBound(k2)
    docs.select(col(idCol).cast("long").as("doc_id"))
      .select(col("doc_id"),
        rendezvousShardCol(col("doc_id"), k).as("from_shard"),
        rendezvousShardCol(col("doc_id"), k2).as("to_shard"))
      .filter(col("from_shard") =!= col("to_shard"))
  }

  /** RENDEZVOUS (HRW) SHARD ASSIGNMENT with the minimal-movement
    * readout — the incremental re-sharding primitive of a 100 TB
    * store: shard(d) = argmax_s w(d, s) (ties → lowest s), and when
    * the shard count grows k → k2 a doc either KEEPS its shard or
    * moves to one of the NEW shards (its old argmax is unbeaten among
    * the old shards), so expected movement is n·(k2−k)/k2 instead of
    * a full reshuffle — rendezvous hashing (Thaler & Ravishankar
    * 1996), the property consistent hashing exists for.
    *
    * Spark shape: one generator (explode of the 0..k2−1 shard range —
    * never a join), one integer weight column, two bounded argmax
    * aggregates over the SAME exploded frame (shards ≤ k vs ≤ k2) —
    * map-side combinable, one shuffle on the id. Returns per doc
    * (doc_id, shard_k, shard_k2, moved).
    */
  def rendezvousShards(docs: DataFrame, idCol: String,
      k: Int, k2: Int): DataFrame = {
    require(1 <= k && k < k2, s"need 1 <= k < k2, got k=$k k2=$k2")
    requireShardBound(k2)
    val w = docs.select(col(idCol).cast("long").as("doc_id"))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(k2 - 1))).as("s"))
      .select(col("doc_id"), col("s").cast("long").as("s"),
        rendezvousWeight(col("doc_id"), col("s")).as("w"))
    val pick = (bound: Int, name: String) =>
      max(when(col("s") < bound,
        struct(col("w"), (-col("s")).as("neg"), col("s")))).as(name)
    w.groupBy(col("doc_id"))
      .agg(pick(k, "a"), pick(k2, "b"))
      .select(col("doc_id"),
        col("a.s").as("shard_k"), col("b.s").as("shard_k2"),
        (col("a.s") =!= col("b.s")).as("moved"))
  }

  /** Family member for [[stratifiedSample]] — deliberately distinct
    * from [[OrderI]] so the sample keep-set is independent of the
    * split/order hash (with the SAME member, "sample 80%" would keep
    * exactly the train split — correlated selections are the classic
    * silent bias in hash-everything pipelines).
    */
  val SampleI: Int = 271828182 // 2*i+1 = 543656365

  /** Deterministic per-stratum rate sampling — `sampleBy` that any
    * engine can replay bit-for-bit: keep a row iff
    * `portableHash(id, SampleI) % denom < rate(stratum) * denom`.
    * Strata absent from `rates` are dropped. Pure per-row projection —
    * no shuffle, no RNG state, independent of partitioning and cluster
    * size, and the keep-set is a pure function of (id, rate): the
    * lineage/auditability requirement for downsampling a 100 TB corpus
    * (rerunning the pipeline, on any cluster, keeps the same rows).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], denom: Long = 1000000L): DataFrame = {
    require(rates.nonEmpty, "rates must not be empty")
    require(denom > 0, s"denom must be positive, got $denom")
    rates.foreach { case (k, r) =>
      require(r >= 0.0 && r <= 1.0, s"rate for '$k' out of [0,1]: $r")
    }
    // -1 threshold drops unknown strata (hash % denom is always >= 0)
    val thr = rates.foldLeft(lit(-1L)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(math.round(r * denom))).otherwise(acc)
    }
    df.filter(portableHash(col(idCol), SampleI) % denom < thr)
  }

  /** SQL predicate spelling of [[stratifiedSample]] for DuckDB oracles. */
  def stratifiedSampleSql(stratumCol: String, idCol: String,
      rates: Map[String, Double], denom: Long = 1000000L): String = {
    val cases = rates.map { case (k, r) =>
      s"WHEN $stratumCol = '$k' THEN ${math.round(r * denom)}"
    }.mkString(" ")
    s"(${portableHashSql(idCol, SampleI)}) % $denom < (CASE $cases ELSE -1 END)"
  }

  /** Deterministic train/val/test assignment by hash bucket: bucket =
    * h(id) mod `nBuckets`; buckets [0, trainBuckets) → "train",
    * [trainBuckets, trainBuckets+valBuckets) → "val", rest → "test".
    * Pure per-row projection — no shuffle, no state, rescales to any
    * cluster size, and a given id lands in the same split forever (the
    * property that keeps eval data out of the training set across
    * pipeline re-runs).
    */
  def splitColumn(id: Column, nBuckets: Int = 10, trainBuckets: Int = 8,
                  valBuckets: Int = 1): Column = {
    val b = portableHash(id) % nBuckets
    when(b < trainBuckets, "train")
      .when(b < trainBuckets + valBuckets, "val")
      .otherwise("test")
  }

  /** SQL spelling of [[splitColumn]] for DuckDB oracles. */
  def splitColumnSql(id: String, nBuckets: Int = 10, trainBuckets: Int = 8,
                     valBuckets: Int = 1): String =
    s"""CASE WHEN (${portableHashSql(id)}) % $nBuckets < $trainBuckets THEN 'train'
       |WHEN (${portableHashSql(id)}) % $nBuckets < ${trainBuckets + valBuckets} THEN 'val'
       |ELSE 'test' END""".stripMargin

  /** Two-pass distributed global running sum (see object doc). Adds:
    *   - `__shard`  = h(id) mod nShards,
    *   - `cum`      : running sum of `valueCol` over the deterministic
    *                  global order (shard, hash, id) within each
    *                  stratum, *inclusive* of the current row.
    * `valueCol` must be integral (the sum is exact, order-independent).
    */
  def globalRunningSum(df: DataFrame, strata: Seq[String], idCol: String,
                       valueCol: String, nShards: Int = 4): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("__shard") && !df.columns.contains("cum"),
      "input must not already contain working columns __shard / cum")
    val h = portableHash(col(idCol))
    val sharded = df.withColumn("__shard", h % nShards)
    val sCols = strata.map(col)
    // pass 1: running sum within each (stratum, shard) — parallel
    val wLocal = Window
      .partitionBy((sCols :+ col("__shard")): _*)
      .orderBy(portableHash(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sharded.withColumn("__cum_local", sum(col(valueCol).cast("long")).over(wLocal))
    // pass 2: per-shard totals (|strata| × nShards rows), exclusive
    // prefix over shards, broadcast back
    val wShard = Window.partitionBy(sCols: _*).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = sharded
      .groupBy((sCols :+ col("__shard")): _*)
      .agg(sum(col(valueCol).cast("long")).as("__shard_total"))
      .withColumn("__prefix", coalesce(sum(col("__shard_total")).over(wShard), lit(0L)))
      .drop("__shard_total")
    local
      .join(broadcast(prefixes), strata :+ "__shard")
      .withColumn("cum", col("__prefix") + col("__cum_local"))
      .drop("__cum_local", "__prefix")
  }

  /** Token-budget mixture sampling: keep each stratum's documents, in
    * deterministic hash order, until the stratum's token budget is
    * exhausted (a document is kept iff it *starts* before the budget
    * boundary — so the sample slightly overshoots rather than
    * undershoots, matching how data mixtures are drawn in practice).
    * This is how a 100 TB corpus is downsampled to a target mixture
    * (e.g. "2B tokens per language"): one parallel prefix sum + a
    * per-row filter, no global sort, no collect.
    */
  def tokenBudgetSample(df: DataFrame, strata: Seq[String], idCol: String,
                        tokenCol: String, budget: Long,
                        nShards: Int = 4): DataFrame =
    globalRunningSum(df, strata, idCol, tokenCol, nShards)
      .filter(col("cum") - col(tokenCol) < budget)
      .drop("__shard")

  /** Fixed-length sequence packing: stream each stratum's documents in
    * deterministic hash order into back-to-back sequences of `seqLen`
    * tokens (documents may span a pack boundary — the standard
    * concat-then-chunk training layout). Emits for every document its
    * first pack (`pack_id`), offset within that pack, and last pack
    * (`pack_end` — > pack_id when the document crosses boundaries).
    * Same two-pass prefix sum; everything else is per-row arithmetic.
    */
  def packSequences(df: DataFrame, strata: Seq[String], idCol: String,
                    tokenCol: String, seqLen: Long,
                    nShards: Int = 4): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    // exact integer `div`, not float floor — token offsets at corpus
    // scale (1e14+) must not round through a double
    globalRunningSum(df, strata, idCol, tokenCol, nShards)
      .withColumn("__start", col("cum") - col(tokenCol))
      .withColumn("pack_id", expr(s"__start div ${seqLen}L"))
      .withColumn("pack_offset", expr(s"__start % ${seqLen}L"))
      .withColumn("pack_end", expr(s"(cum - 1) div ${seqLen}L"))
      .drop("__start", "__shard")
  }

  /** Temperature-weighted domain mixture (the GPT-3 / Gopher sampling
    * scheme, Brown et al. 2020 §2.2, Rae et al. 2021 — also the
    * multilingual temperature sampling of Conneau & Lample 2019):
    * domain d with `tot_d` tokens gets sampling weight `tot_d^alpha`
    * (alpha < 1 flattens the natural distribution toward uniform, so
    * small domains are over-represented relative to their size), a
    * token target of `budget * w_d / Σw`, and a per-row keep rate of
    * `min(1, target_d / tot_d)`, applied with the same deterministic
    * hash predicate as [[stratifiedSample]] (member [[SampleI]]).
    *
    * Cross-engine determinism: the weight is FIXED-POINT —
    * `round(tot^alpha * 1e6)` as a long — so the weight SUM is exact
    * integer arithmetic with no float-summation-order hazard, and the
    * rate is one double expression over exact integers (identical in
    * any IEEE engine). alpha = 0.5 uses `sqrt`, which IEEE requires to
    * be correctly rounded; other alphas go through `pow`, correctly
    * rounded in practice but not guaranteed by the standard (the 1e-10
    * fixed-point boundary makes a ULP flip astronomically unlikely).
    *
    * Scale shape: one partial-aggregated groupBy for the domain totals
    * (|domains| rows — tiny), weights and rates computed on that tiny
    * table, broadcast-joined back, then a pure per-row hash predicate.
    * No data-sized shuffle at all beyond the totals aggregate.
    *
    * Returns one row per input doc: (domain, id, n_tokens, rate, keep).
    */
  def temperatureMixture(docs: DataFrame, domainCol: String, idCol: String,
      tokenCount: Column, budgetTokens: Long, alpha: Double = 0.5,
      denom: Long = 1000000L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(denom > 0, s"denom must be positive, got $denom")
    val perDoc = docs.select(col(domainCol).as("domain"),
      col(idCol).cast("long").as("id"), tokenCount.cast("long").as("n_tokens"))
    val tot = col("tot_tokens").cast("double")
    val wexp = if (alpha == 0.5) sqrt(tot) else pow(tot, alpha)
    val weights = perDoc.groupBy(col("domain"))
      .agg(sum(col("n_tokens")).as("tot_tokens"))
      .withColumn("w", round(wexp * denom).cast("long"))
    val wsum = weights.agg(sum(col("w")).as("wsum"))
    val rates = weights.crossJoin(broadcast(wsum))
      .withColumn("rate", least(lit(1.0),
        (lit(budgetTokens.toDouble) * col("w").cast("double")) /
          (col("wsum").cast("double") * col("tot_tokens").cast("double"))))
      .select(col("domain"), col("rate"),
        round(col("rate") * denom).cast("long").as("__thr"))
    perDoc.join(broadcast(rates), "domain")
      .select(col("domain"), col("id"), col("n_tokens"), col("rate"),
        (portableHash(col("id"), SampleI) % denom < col("__thr")).as("keep"))
  }

  /** SQL (DuckDB) spelling of [[temperatureMixture]]'s verdicts for
    * oracles, alpha = 0.5. `perDocSql` must yield (domain, id,
    * n_tokens) with id/n_tokens BIGINT.
    */
  def temperatureMixtureSql(perDocSql: String, budgetTokens: Long,
      denom: Long = 1000000L): String =
    s"""p AS ($perDocSql),
       |wt AS (SELECT domain, sum(n_tokens) AS tot_tokens,
       |    cast(round(sqrt(cast(sum(n_tokens) as double)) * $denom) as bigint) AS w
       |  FROM p GROUP BY domain),
       |r AS (SELECT domain, rate,
       |    cast(round(rate * $denom) as bigint) AS thr FROM (
       |  SELECT domain, least(1.0,
       |      ($budgetTokens.0 * cast(w as double)) /
       |      (cast((SELECT sum(w) FROM wt) as double) * cast(tot_tokens as double))) AS rate
       |  FROM wt)),
       |v AS (SELECT p.domain, p.id, p.n_tokens, r.rate,
       |    (${portableHashSql("p.id", SampleI)}) % $denom < r.thr AS keep
       |  FROM p JOIN r USING (domain))""".stripMargin

  // ---------- DSIR-style importance resampling ----------

  /** 16.16 fixed-point floor-linear log2 of a positive integer SQL
    * expression — INTEGER-EXACT in any engine, which is the whole
    * point: `log2fp(x) = p*65536 + ((x << 16) >> p) - 65536` with
    * `p = floor(log2 x)` read off the binary-string length. No
    * transcendental call (whose last ULP differs across engines'
    * libm), just string length, one multiply, one shift. The
    * piecewise-linear mantissa is within 0.086 of true log2 —
    * irrelevant for ranking/thresholding, decisive for replayability.
    */
  private[graft] def log2Fp(x: String): Column = expr(
    s"cast((length(bin($x)) - 1) * 65536 " +
      s"+ shiftright(($x) * 65536, cast(length(bin($x)) - 1 as int)) " +
      s"- 65536 as bigint)")

  /** DuckDB spelling of the same fixed-point log2 (binary string via
    * `format('{:b}', x)`), for oracles. Bit-identical to [[log2Fp]].
    */
  def log2FpSql(x: String): String =
    s"((length(format('{:b}', $x))-1)*65536 " +
      s"+ (($x)*65536 // (1::BIGINT << (length(format('{:b}', $x))-1))) - 65536)"

  /** DSIR-shaped importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how target-like its hashed-ngram features are.
    * Features are [[TextAnalysis.hashedNgramBuckets]] (unigrams +
    * bigrams hashed into `dim` buckets); each bucket's log-likelihood
    * ratio is `log2(ct_target+1) - log2(ct_raw+1)` in the integer-exact
    * 16.16 fixed point of [[log2Fp]], so a document's score (sum of
    * its features' ratios) is a sum of bigints — exact under any
    * aggregation order, replayable by the oracle engine bit-for-bit.
    *
    * `isTarget` marks the in-domain rows (the distribution to steer
    * toward); the raw distribution is the whole corpus. `thrFp` is the
    * keep bar on the MEAN feature ratio in fixed-point units; the
    * verdict is the pure integer comparison
    * `lr_sum >= thrFp * n_feats` — deliberately not an integer
    * division, whose negative-operand rounding differs across engines
    * (floor vs truncation).
    *
    * 100 TB shape: one exploded scan feeds a `dim`-row partial-agg
    * count table (tiny — broadcast back), then a second scan sums the
    * per-feature ratios per document with map-side combine. No
    * data-sized shuffle beyond the per-doc sum; the bucket table is
    * the only coordination point, and it is O(dim), not O(corpus).
    *
    * Returns (doc_id, n_feats, lr_sum, importance, keep) with
    * `importance = lr_sum / (n_feats * 65536)` — mean log2 ratio.
    */
  /** The per-bucket fixed-point log-likelihood ratio table of
    * [[dsirImportance]] — `(bucket, lr_fp)` with
    * `lr_fp = log2fp(ct_target+1) - log2fp(ct_raw+1)`. Exposed
    * separately because it is the LEARNED ASSET of importance
    * resampling: built once over the corpus (one exploded scan into a
    * `dim`-row partial aggregate), then reused to score any shard or
    * stream (see [[graft.streaming.Streaming.streamDsirScore]]).
    * Buckets absent from the corpus have ratio 0 by construction
    * (log2fp(1) - log2fp(1)); scorers coalesce misses to 0.
    */
  def dsirRatioTable(docs: DataFrame, textCol: String, isTarget: Column,
      dim: Int = 1024): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    docs.select(isTarget.as("is_t"),
        explode(TextAnalysis.hashedNgramBuckets(col(textCol), dim)).as("bucket"))
      .groupBy(col("bucket")).agg(
        count(lit(1)).as("ct_raw"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct_t"))
      .select(col("bucket"),
        (log2Fp("ct_t + 1") - log2Fp("ct_raw + 1")).as("lr_fp"))
  }

  def dsirImportance(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int = 1024, thrFp: Long = -170000L): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val feats = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(TextAnalysis.hashedNgramBuckets(col(textCol), dim)).as("bucket"))
    feats.join(broadcast(dsirRatioTable(docs, textCol, isTarget, dim)), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_feats"), sum(col("lr_fp")).as("lr_sum"))
      .select(col("doc_id"), col("n_feats"), col("lr_sum"),
        round(col("lr_sum").cast("double") /
          (col("n_feats").cast("double") * 65536.0), 6).as("importance"),
        (col("lr_sum") >= lit(thrFp) * col("n_feats")).as("keep"))
  }

  // ---------- hashed-bigram LM perplexity filter (CCNet-style) ----------

  /** Per-position (context, bigram) hash-bucket pairs of a text column:
    * for tokens w1..wn, position i yields
    * `(bucket_ctx(w_i), bucket_bi(w_i + " " + w_{i+1}))` — the context
    * token hashed into `[0, ctxDim)` and the joined bigram into
    * `[0, biDim)` under the engine-portable rolling hash. The hashed
    * stand-in for a bigram LM's (history, event) pair; `biDim >>
    * ctxDim` keeps event buckets sparse enough to discriminate.
    */
  private[graft] def lmPairBuckets(text: Column, ctxDim: Int,
      biDim: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => struct(
        pmod(TextAnalysis.stringHash(a), lit(ctxDim.toLong)).as("ctx"),
        pmod(TextAnalysis.stringHash(concat(a, lit(" "), b)),
          lit(biDim.toLong)).as("bi")))
  }

  /** Hashed-bigram language model counts (the hashing-trick stand-in
    * for CCNet's KenLM, Wenzek et al. 2020): ONE exploded scan with
    * map-side partial aggregation collapses the corpus to
    * `(kind, bucket, ct)` — kind 0 = context-token buckets (`ctxDim`
    * rows at most), kind 1 = bigram buckets (`biDim` rows at most).
    * Both marginals are dim-bounded BY CONSTRUCTION, independent of
    * corpus size, so they broadcast at any scale. This is the LEARNED
    * ASSET of perplexity filtering: built once, reused to score any
    * shard or stream.
    */
  def lmBigramCounts(docs: DataFrame, textCol: String,
      ctxDim: Int = 1024, biDim: Int = 65536): DataFrame = {
    require(ctxDim > 0 && biDim > 0, s"dims must be positive: $ctxDim, $biDim")
    docs.select(explode(lmPairBuckets(col(textCol), ctxDim, biDim)).as("pr"))
      .select(explode(array(
        struct(lit(0).as("kind"), col("pr.ctx").as("bucket")),
        struct(lit(1).as("kind"), col("pr.bi").as("bucket")))).as("k"))
      .groupBy(col("k.kind").as("kind"), col("k.bucket").as("bucket"))
      .agg(count(lit(1)).as("ct"))
  }

  /** CCNet-shaped perplexity filter: score every document by its mean
    * hashed-bigram surprisal under [[lmBigramCounts]],
    *
    *   bits(ctx, bi) = log2fp(ct_ctx + biDim) - log2fp(ct_bi + 1)
    *
    * (add-one-smoothed `-log2 P(bigram | context)` in the shared
    * integer-exact 16.16 fixed-point log2 — no libm call to drift by a
    * ULP). Keep = the fluent half: the document's FLOOR-mean surprisal
    * is at most the corpus floor-mean (`bits_sum div n_bigrams <=
    * tot_bits div tot_n` — both divisions over non-negatives, where
    * floor and truncation agree across engines). A relative bar, so
    * the verdict discriminates at every corpus scale, unlike a fixed
    * bits constant whose meaning drifts as counts grow.
    *
    * 100 TB shape: scan 1 builds the dim-bounded marginal tables; scan
    * 2 explodes the corpus once more and joins BOTH BROADCAST
    * marginals — the per-doc sum is the only data-sized shuffle, and
    * it partial-aggregates map-side. The corpus mean is a second tiny
    * reduction over the per-doc table, joined back on a constant key
    * (a broadcast hash join, not a nested loop). No data-sized join,
    * ever.
    */
  def lmPerplexity(docs: DataFrame, idCol: String, textCol: String,
      ctxDim: Int = 1024, biDim: Int = 65536): DataFrame = {
    val counts = lmBigramCounts(docs, textCol, ctxDim, biDim)
    val ctxT = counts.filter(col("kind") === 0)
      .select(col("bucket").as("ctx"), col("ct").as("ct_ctx"))
    val biT = counts.filter(col("kind") === 1)
      .select(col("bucket").as("bi"), col("ct").as("ct_bi"))
    val pairs = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(lmPairBuckets(col(textCol), ctxDim, biDim)).as("pr"))
      .select(col("doc_id"), col("pr.ctx").as("ctx"), col("pr.bi").as("bi"))
    val scored = pairs.join(broadcast(ctxT), "ctx").join(broadcast(biT), "bi")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(log2Fp(s"ct_ctx + $biDim") - log2Fp("ct_bi + 1")).as("bits_sum"))
    val corpusMean = scored.agg(
        expr("sum(bits_sum) div sum(n_bigrams)").as("corpus_mean_fp"))
      .withColumn("jk", lit(1))
    scored.withColumn("jk", lit(1))
      .join(broadcast(corpusMean), "jk")
      .select(col("doc_id"), col("n_bigrams"), col("bits_sum"),
        round(col("bits_sum").cast("double") /
          (col("n_bigrams").cast("double") * 65536.0), 6).as("bits_per_bigram"),
        col("corpus_mean_fp"),
        (expr("bits_sum div n_bigrams") <= col("corpus_mean_fp")).as("keep"))
  }

  // ---------- weighted sampling without replacement ----------

  /** Spark-SQL spelling of the 16.16 fixed-point log2 (same function
    * as [[log2Fp]], as a composable SQL fragment).
    */
  private def log2FpSparkSql(x: String): String =
    s"cast((length(bin($x)) - 1) * 65536 " +
      s"+ shiftright(($x) * 65536, cast(length(bin($x)) - 1 as int)) " +
      s"- 65536 as bigint)"

  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement, `k`
    * rows per stratum, deterministic and integer-exact: each row draws
    * `u = hash(id) % 65536 + 1` (its reproducible uniform) and ranks by
    *
    *   es_key = (16·65536 - log2fp(u)) * 1e6  div  max(weight, 1)
    *
    * — the E-S key `-log u / w` with `-log2(u/65536)` in fixed point;
    * the k SMALLEST keys per stratum win, ties to the lowest id. Both
    * `div` operands are non-negative, so floor and truncation agree
    * across engines. Inclusion probability is proportional to weight
    * in the without-replacement sense of E-S (SODA'06).
    *
    * 100 TB shape: the key is a pure per-row projection; the
    * rank-filtered window plans as `WindowGroupLimit` — every task
    * keeps only its local top-k per stratum before the shuffle, so no
    * stratum is ever sorted whole.
    */
  /** The E-S ranking key as a Spark-SQL fragment over an id expression
    * and a weight expression — shared by [[weightedSample]] and the
    * streaming [[graft.streaming.Streaming.streamWeightedSample]] so
    * batch and stream can never rank differently.
    */
  private[graft] def esKeySql(idExpr: String, wExpr: String): String = {
    val u = s"((${portableHashSql(idExpr, SampleI)}) % 65536 + 1)"
    s"((${16L * 65536L} - ${log2FpSparkSql(u)}) * 1000000) " +
      s"div greatest(cast(($wExpr) as bigint), 1)"
  }

  def weightedSample(df: DataFrame, stratumCol: String, idCol: String,
      weightSql: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val keySql = esKeySql(idCol, weightSql)
    df.select(col(stratumCol).as("stratum"),
        col(idCol).cast("long").as("doc_id"),
        greatest(expr(weightSql).cast("long"), lit(1L)).as("w"),
        expr(keySql).as("es_key"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("stratum").orderBy(col("es_key"), col("doc_id")))
        .cast("long"))
      .filter(col("rn") <= k)
  }

  // ---------- histogram-quantile threshold selection ----------

  /** Per-stratum top-fraction selection by HISTOGRAM quantile: bucket
    * an integer score into `nBuckets` fixed-width bins, count per
    * `(stratum, bucket)` — a table bounded by |strata|·nBuckets, never
    * by the corpus — and pick, per stratum, the highest bucket whose
    * from-the-top cumulative count first covers
    * `ceil(total * num/den)` docs. Keep = `bucket >= thr`. The
    * threshold is integer-exact (counts and a ceiling division of
    * non-negatives), so the verdict never sits on a float boundary.
    *
    * This is the scale-sane spelling of "keep the top 10% by score per
    * domain": an exact per-stratum rank needs a full sort of each
    * stratum (a scale-killer when one domain is 40 TB); the bucket
    * histogram needs one partial-aggregated scan plus tiny-table
    * arithmetic, and is exact at bucket granularity (keeps the minimal
    * bucket-aligned superset of the top fraction).
    */
  def histogramThreshold(df: DataFrame, stratumCol: String, idCol: String,
      scoreSql: String, bucketWidth: Long = 16L, nBuckets: Int = 256,
      topNum: Long = 1L, topDen: Long = 10L): DataFrame = {
    require(bucketWidth > 0 && nBuckets > 0 && topNum > 0 && topDen >= topNum,
      s"bad params: width=$bucketWidth n=$nBuckets frac=$topNum/$topDen")
    val scored = df.select(col(stratumCol).as("stratum"),
      col(idCol).cast("long").as("doc_id"),
      expr(scoreSql).cast("long").as("score"),
      least(expr(s"cast(($scoreSql) as bigint) div $bucketWidth"),
        lit(nBuckets - 1L)).as("bucket"))
    val hist = scored.groupBy("stratum", "bucket").agg(count(lit(1)).as("ct"))
    val cum = hist.withColumn("cum", sum("ct").over(
        Window.partitionBy("stratum")
          .orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum("ct").over(Window.partitionBy("stratum")))
    val thr = cum
      .filter(col("cum") * topDen >= col("total") * topNum)
      .groupBy("stratum").agg(max("bucket").as("thr_bucket"))
    scored.join(broadcast(thr), Seq("stratum"))
      .select(col("doc_id"), col("stratum"), col("score"), col("bucket"),
        col("thr_bucket"), (col("bucket") >= col("thr_bucket")).as("keep"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.4): per
    * LANGUAGE, docs split into head/middle/tail thirds by LM bits —
    * the lowest-perplexity third is the "head", the slice CCNet keeps
    * for clean pretraining data. The per-doc score is [[lmPerplexity]]'s
    * exact integer `bits_sum div n_bigrams` (1/65536-bit units); the
    * tertile thresholds come from a per-language `nBuckets`-bin
    * HISTOGRAM of that score (bin width 1/8 bit by default) — never a
    * per-language sort: the threshold table is |langs| x nBuckets
    * counts, broadcastable at any corpus size, and the class is exact
    * at bucket granularity (t25's convention). Cut ranks use the
    * ceil-thirds rule (cum·3 >= total, cum·3 >= 2·total); both window
    * aggregates run over the bounded histogram, not the corpus. Docs
    * with no bigram (single-token) have no LM score and are absent,
    * exactly as in t23.
    */
  def ccnetBuckets(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang",
      bucketWidth: Long = 8192L, nBuckets: Int = 256): DataFrame = {
    require(bucketWidth > 0 && nBuckets > 1,
      s"bad params: width=$bucketWidth n=$nBuckets")
    val scored = lmPerplexity(docs, idCol, textCol)
      .select(col("doc_id"), expr("bits_sum div n_bigrams").as("bits_fp"))
      .join(docs.select(col(idCol).cast("long").as("doc_id"),
        col(langCol).as("lang")), "doc_id")
      .withColumn("bucket",
        least(expr(s"bits_fp div $bucketWidth"), lit(nBuckets - 1L)))
    val hist = scored.groupBy("lang", "bucket").agg(count(lit(1)).as("ct"))
    val cum = hist.withColumn("cum", sum("ct").over(
        Window.partitionBy("lang").orderBy(col("bucket").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum("ct").over(Window.partitionBy("lang")))
    val thr = cum.groupBy("lang").agg(
      min(when(col("cum") * 3 >= col("total"), col("bucket")))
        .as("head_thr"),
      min(when(col("cum") * 3 >= col("total") * 2, col("bucket")))
        .as("mid_thr"))
    scored.join(broadcast(thr), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("bits_fp"), col("bucket"),
        col("head_thr"), col("mid_thr"),
        when(col("bucket") <= col("head_thr"), "head")
          .when(col("bucket") <= col("mid_thr"), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** RAG/training-window chunking with overlap: split each document's
    * whitespace tokens into windows of `chunkTok` tokens whose starts
    * advance by `stride` (stride < chunkTok = overlapping context
    * windows — the standard retrieval/packing chunk layout; the final
    * window may be short). Chunk count is exact integer arithmetic
    * (ceil spelled as floor-div of non-negatives, so any engine
    * replays it bit-for-bit) and chunking is tokenize-once + one
    * exploded `sequence` + per-row `slice` — a completely narrow op:
    * no shuffle, no state, scales as a pure map over the corpus. The
    * emitted rolling hash stands in for the window text so downstream
    * chunk-level dedup/joins move 8 bytes per chunk, not the string.
    */
  def chunkOverlap(docs: DataFrame, chunkTok: Int = 64, stride: Int = 48,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTok >= 1 && stride >= 1 && stride <= chunkTok,
      s"need 1 <= stride <= chunkTok, got chunkTok=$chunkTok stride=$stride")
    val base = docs.select(col(idCol),
        graft.functions.TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        when(col("n_tok") <= chunkTok, lit(1L))
          .otherwise(expr(s"((n_tok - $chunkTok + ${stride - 1}) div $stride) + 1")))
    base.select(col(idCol), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("chunk",
        slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(chunkTok)))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        size(col("chunk")).cast("long").as("chunk_tok"),
        graft.functions.TextAnalysis.rollingHash(array_join(col("chunk"), " "))
          .as("chunk_hash"))
  }

  // ---------- trained quality classifier (t46) ----------

  /** 16.16 fixed-point log2 of a positive Long — the Scala twin of
    * [[log2FpSql]] (bit-identical: both read the top bit position and
    * truncate the shifted mantissa).
    */
  private def log2FpLong(x: Long): Long = {
    val l = 63 - java.lang.Long.numberOfLeadingZeros(x)
    l.toLong * 65536L + ((x * 65536L) >> l) - 65536L
  }

  /** TRAINED linear quality classifier over hashed n-gram features —
    * the "train the quality classifier" pipeline step on the codebook
    * recipe ([[Similarity.ivfTrainCentroidsFp]] discipline): a bounded
    * deterministic hash-order sample with teacher labels; weights are
    * the naive-Bayes log-odds of each feature bucket in 16.16 fixed
    * point, w_b = log2fp((cp_b+1)·(tn+dim)) − log2fp((cn_b+1)·(tp+dim))
    * (cp/cn = the bucket's occurrence counts in keep/drop sample docs,
    * tp/tn the class totals — one commutative integer aggregation
    * pass); the decision threshold is then CALIBRATED exactly: the
    * sample-score cut point maximizing training accuracy (ties → the
    * lowest threshold, candidates = the distinct sample scores plus a
    * below-everything sentinel). Closed-form by measurement, not
    * laziness: a 10-round full-batch integer perceptron on the same
    * features provably thrashed here (train accuracy pinned at the
    * majority rate — the teacher's margin is far too small for unit
    * batch steps), while the NB estimate is deterministic, one pass,
    * and bit-replayable, so the ENTIRE training replays in SQL with no
    * iteration at all. Buckets unseen in the sample weigh 0.
    *
    * t46 distills t23's perplexity gate: the teacher thresholds mean
    * hashed-bigram surprisal, a linear form in the student's feature
    * space, so the student genuinely learns it (ClassifierSpec holds
    * the holdout floor vs the majority baseline). Returns the dense
    * weight array (length `dim`, a KB-scale broadcastable asset) and
    * the calibrated threshold.
    */
  def trainQualityClassifierFp(docs: DataFrame, labels: DataFrame,
      dim: Int = 4096, sampleN: Int = 256,
      idCol: String = "doc_id", textCol: String = "text"): (Array[Long], Long) = {
    val P = 1000000007L
    val sample: Array[(Boolean, Array[Long])] = docs
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.hashedNgramBuckets(col(textCol), dim).as("bk"),
        ((lit(3L) * (col(idCol).cast("long") % P) + 8L) % P).as("h"))
      .join(labels.select(col(idCol).cast("long").as("id"),
        col("keep").cast("boolean").as("y")), "id")
      .orderBy(col("h").asc, col("id").asc)
      .limit(sampleN)
      .select(col("y"), col("bk"))
      .collect()
      .map(r => (r.getBoolean(0), r.getSeq[Long](1).toArray))
    if (sample.isEmpty) return (new Array[Long](dim), 0L) // empty shard
    val cp = new Array[Long](dim)
    val cn = new Array[Long](dim)
    sample.foreach { case (y, bks) =>
      var i = 0
      while (i < bks.length) {
        if (y) cp(bks(i).toInt) += 1L else cn(bks(i).toInt) += 1L
        i += 1
      }
    }
    val tp = cp.sum
    val tn = cn.sum
    val w = new Array[Long](dim)
    var b = 0
    while (b < dim) {
      if (cp(b) > 0L || cn(b) > 0L)
        w(b) = log2FpLong((cp(b) + 1L) * (tn + dim)) -
          log2FpLong((cn(b) + 1L) * (tp + dim))
      b += 1
    }
    def score(bks: Array[Long]): Long = {
      var s = 0L
      var i = 0
      while (i < bks.length) { s += w(bks(i).toInt); i += 1 }
      s
    }
    val scores = sample.map { case (y, bks) => (score(bks), y) }
    val cands = (scores.map(_._1).min - 1L) +: scores.map(_._1).distinct.sorted
    var bestThr = cands.head
    var bestAcc = -1L
    cands.foreach { thr =>
      val acc = scores.count { case (s, y) => (s > thr) == y }.toLong
      if (acc > bestAcc) { bestAcc = acc; bestThr = thr }
    }
    (w, bestThr)
  }

  /** Score a corpus with the trained weights + calibrated gate: one
    * exploded feature scan against the broadcast complete weight table
    * (dim rows, zeros included so the equi-join never drops a feature)
    * — the same one-scan shape as the frozen-weight t45.
    */
  def applyQualityClassifier(docs: DataFrame, weights: Array[Long],
      threshold: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits.localSeqToDatasetHolder
    import spark.implicits.newProductEncoder
    val dim = weights.length
    val wDf = broadcast(weights.toSeq.zipWithIndex
      .map { case (wt, b) => (b.toLong, wt) }.toDF("bucket", "wt"))
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.hashedNgramBuckets(col(textCol), dim)).as("bucket"))
      .join(wDf, Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("wt")).as("score_fp"))
      .select(col("doc_id"), col("n_feats"), col("score_fp"),
        (col("score_fp") > threshold).as("pred"))
  }
}
