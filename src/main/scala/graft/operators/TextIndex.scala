package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus indexing: term/document frequencies and per-document salient
  * terms (the TF-IDF building blocks a filtering/topic pipeline uses).
  *
  * Ranking is by the exact integer pair (tf DESC, df ASC) with the term
  * string as final tie-break — equivalent to ranking by tf·idf with
  * idf = 1/df, but free of float transcendentals, so the result is
  * bit-identical across engines (the DuckDB oracle runs the same
  * integer sort).
  *
  * 100 TB shape: tokenize+explode is per-row; both frequency tables are
  * map-side-combinable hash aggregates; the tf⋈df equi-join shuffles on
  * `term` (the df side is corpus-vocabulary sized — broadcast it when it
  * fits, as `topTerms` does via autoBroadcast); the final top-k is a
  * per-document window over tiny groups. No global sort, no collect.
  */
object TextIndex {

  /** (id, term, tf) — term frequencies per document. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))

  /** (term, df) — number of documents containing each term. */
  def docFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy("term").agg(count(lit(1)).as("df"))

  /** Count-min sketch over the corpus token stream (Cormode &
    * Muthukrishnan 2005): `depth` hash rows x `width` columns of
    * counts, built in ONE exploded scan with map-side partial
    * aggregation — the sketch is `depth * width` cells BY CONSTRUCTION
    * regardless of corpus size, so it broadcasts anywhere. Hashes are
    * `depth` large-multiplier members of the portable family over the
    * term's rolling hash, so the sketch — like the KMV/Bloom sketches —
    * is a DETERMINISTIC function of the token stream that the DuckDB
    * oracle replays bit-for-bit (an engine-native CM sketch has no
    * such cross-engine spelling).
    */
  def cmSketch(docs: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch dims: $depth x $width")
    val base = TextAnalysis.stringHash(col("term"))
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("row"),
          (Mixture.portableHash(base, Mixture.OrderI + j) % width)
            .as("col"))): _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.col").as("col"))
      .agg(count(lit(1)).as("ct"))
  }

  /** Heavy hitters by count-min estimate, with the exact count beside
    * the estimate as the measured overcount (the sketch never
    * undercounts — `est >= exact` is a structural invariant the spec
    * asserts). The production path needs only the broadcast sketch and
    * a distinct-term probe stream; the exact side here is the quality
    * measurement, same convention as q35's KMV-vs-countDistinct.
    */
  def cmHeavyHitters(docs: DataFrame, textCol: String, minCount: Long,
      depth: Int = 4, width: Int = 1024): DataFrame =
    cmSelect(cmSketch(docs, textCol, depth, width), docs, textCol,
      minCount, depth, width)

  /** The selection half of [[cmHeavyHitters]], parameterized on the
    * sketch relation so a STREAM-maintained sketch (st18) probes
    * through the identical plan as the batch-built one.
    */
  def cmSelect(sketch: DataFrame, docs: DataFrame, textCol: String,
      minCount: Long, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(minCount >= 1, s"minCount must be positive, got $minCount")
    val exact = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact"))
    val base = TextAnalysis.stringHash(col("term"))
    val probes = exact.select(col("term"), col("exact"),
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("row"),
            (Mixture.portableHash(base, Mixture.OrderI + j) % width)
              .as("col"))): _*)).as("c"))
      .select(col("term"), col("exact"),
        col("c.row").as("row"), col("c.col").as("col"))
    probes.join(broadcast(sketch), Seq("row", "col"))
      .groupBy("term")
      .agg(first(col("exact")).as("exact"), min(col("ct")).as("est"))
      .filter(col("est") >= minCount)
      .select(col("term"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overcount"))
  }

  /** Top-`k` most salient terms per document by (tf DESC, df ASC, term). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val df = docFrequencies(tf)
    val w = Window.partitionBy("id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, "term")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("df"), col("rank"))
  }

  /** Corpus novelty score per document: the fraction of the document's
    * DISTINCT n-gram shingles appearing nowhere else in the corpus
    * (df == 1). ~1 = unique content, ~0 = boilerplate or a copy — the
    * memorization/novelty signal a curation run reads next to the
    * dedup verdicts (a near-dup's novelty collapses without ever
    * running a pair join). Dataflow: one posting pass
    * ([[Dedup.shingles]] — per-doc JVM kernel, already distinct), one
    * map-side-combinable df aggregate, the posting equi-join back on
    * the shingle hash, one per-doc aggregate. Every shuffle is on a
    * bounded-width integer key; there is NO pair join anywhere, so the
    * cost is linear in posting volume at any corpus size.
    */
  def noveltyScores(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val posts = Dedup.shingles(docs, textCol, idCol, n)
    val df = posts.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    posts.join(df, "sh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("id").as("doc_id"),
        col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 6).as("novelty"))
  }

  /** HyperLogLog distinct-count sketch over ANY portable-hash column —
    * the fourth member of the sketch family (Bloom q26, KMV q35,
    * count-min t26). Input is a relation with a non-negative hash in
    * [0, 2^30) (the rolling-hash family's range: shingle hashes, chunk
    * hashes, fingerprints); p bucket bits pick one of m = 2^p
    * registers, the (30 - p)-bit window ABOVE the bucket bits supplies
    * the rank (leading-zero count + 1, spelled as
    * `(31 - p) - length(bin(w))` — pure integer/string ops any engine
    * reproduces), each register keeps its max rank, and the raw HLL
    * estimate comes out of an exact integer numerator
    * (sum over registers of 2^(maxRho - rho), empty registers at
    * 2^maxRho) so the only float arithmetic is one textually-fixed
    * expression both engines evaluate identically. No small-range
    * correction (it would need a transcendental ln whose last ulp can
    * differ across engines) — callers estimate domains with
    * n >> 2.5m, and the exact count rides along as the measured
    * error, q35's convention. 100 TB shape: the register table is 2^p
    * rows BY CONSTRUCTION (broadcastable at any corpus size) and both
    * passes are partial-aggregatable hash aggregates — HLL registers
    * merge by max, which is exactly what the partial aggregate does.
    */
  def hllDistinct(values: DataFrame, hashCol: String, p: Int = 10): DataFrame =
    hllSelect(hllRegisters(values, hashCol, p), values, hashCol, p)

  /** The register-build half of [[hllDistinct]]: per-bucket max rank.
    * Streaming-safe (max in update mode), which is how st21 maintains
    * the registers over an unbounded stream in O(2^p) state.
    */
  def hllRegisters(values: DataFrame, hashCol: String, p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p must be in [4, 16]")
    val m = 1 << p
    // rank window = the (30 - p) hash bits above the bucket bits
    // (rollingHash < 2^30); max rank = window width + 1
    val maxRho = 31 - p
    values.select((col(hashCol) % m).as("bucket"),
        expr(s"$hashCol div $m").as("w"))
      .withColumn("rho",
        expr(s"CASE WHEN w = 0 THEN $maxRho ELSE $maxRho - length(bin(w)) END"))
      .groupBy("bucket").agg(max("rho").as("rho"))
  }

  /** The estimate half of [[hllDistinct]], parameterized on the
    * register relation so a STREAM-maintained register table (st21)
    * reads out through the identical arithmetic as the batch-built
    * one (t26/st18's cmSelect convention). `exactSource` supplies the
    * measured-error baseline.
    */
  def hllSelect(regs: DataFrame, exactSource: DataFrame, hashCol: String,
      p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p must be in [4, 16]")
    val m = 1 << p
    val maxRho = 31 - p
    val denom = 1L << maxRho
    val sums = regs.agg(count(lit(1)).as("present"),
      sum(expr(s"cast(shiftleft(1L, cast($maxRho - rho as int)) as bigint)"))
        .as("num_present"))
    val exact = exactSource
      .agg(countDistinct(col(hashCol)).as("n_exact"))
    val estExpr =
      s"""cast(0.7213 as double) / (cast(1.0 as double)
         |  + cast(1.079 as double) / cast($m as double))
         |  * cast($m as double) * cast($m as double)
         |  * cast($denom as double) / cast(num as double)""".stripMargin
    sums.crossJoin(exact)
      .select(lit(m.toLong).as("m"),
        (lit(m.toLong) - col("present")).as("v_zero"),
        col("n_exact"),
        (col("num_present") + (lit(m.toLong) - col("present")) * denom)
          .as("num"))
      .select(col("m"), col("v_zero"), col("n_exact"),
        expr(s"round($estExpr, 6)").as("est"),
        expr(s"round(abs(($estExpr) - cast(n_exact as double)) " +
          "/ cast(n_exact as double), 6)").as("rel_err"))
  }

  /** [[hllDistinctByGroup]] WITHOUT the exact-count rider — the pure
    * sketch path: two partial-aggregatable hash aggregates (registers,
    * then the per-group numerator), NO count-distinct Expand anywhere
    * in the plan. This is what a 100 TB column-stats job actually
    * runs; q53 composes it and carries its own exact NDV as the
    * measured-error rider instead. Returns (grp, est).
    */
  def hllEstByGroup(values: DataFrame, groupCol: String,
      hashCol: String, p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p must be in [4, 16]")
    val m = 1 << p
    val maxRho = 31 - p
    val denom = 1L << maxRho
    val regs = values
      .select(col(groupCol).as("grp"), (col(hashCol) % m).as("bucket"),
        expr(s"$hashCol div $m").as("w"))
      .withColumn("rho",
        expr(s"CASE WHEN w = 0 THEN $maxRho ELSE $maxRho - length(bin(w)) END"))
      .groupBy("grp", "bucket").agg(max("rho").as("rho"))
    val estExpr =
      s"""cast(0.7213 as double) / (cast(1.0 as double)
         |  + cast(1.079 as double) / cast($m as double))
         |  * cast($m as double) * cast($m as double)
         |  * cast($denom as double) / cast(num as double)""".stripMargin
    regs.groupBy("grp").agg(count(lit(1)).as("present"),
        sum(expr(s"cast(shiftleft(1L, cast($maxRho - rho as int)) as bigint)"))
          .as("num_present"))
      .select(col("grp"),
        (col("num_present") + (lit(m.toLong) - col("present")) * denom)
          .as("num"))
      .select(col("grp"), expr(s"round($estExpr, 6)").as("est"))
  }

  /** Per-group HLL distinct estimates — APPROX_COUNT_DISTINCT as an
    * explicit mergeable sketch: registers keyed by (group, bucket), so
    * the whole computation is still two partial-aggregatable hash
    * aggregates and the register state is |groups| * 2^p rows BY
    * CONSTRUCTION. Same exact-integer numerator and textually-fixed
    * double readout as [[hllDistinct]]; the exact per-group count
    * rides along as the measured error. Pick p so every group's
    * cardinality clears the ~2.5 * 2^p small-range bar (no ln
    * correction, by design — see [[hllDistinct]]).
    */
  def hllDistinctByGroup(values: DataFrame, groupCol: String,
      hashCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p must be in [4, 16]")
    val m = 1 << p
    val maxRho = 31 - p
    val denom = 1L << maxRho
    val regs = values
      .select(col(groupCol).as("grp"), (col(hashCol) % m).as("bucket"),
        expr(s"$hashCol div $m").as("w"))
      .withColumn("rho",
        expr(s"CASE WHEN w = 0 THEN $maxRho ELSE $maxRho - length(bin(w)) END"))
      .groupBy("grp", "bucket").agg(max("rho").as("rho"))
    val sums = regs.groupBy("grp").agg(count(lit(1)).as("present"),
      sum(expr(s"cast(shiftleft(1L, cast($maxRho - rho as int)) as bigint)"))
        .as("num_present"))
    val exact = values.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(hashCol)).as("n_exact"))
    val estExpr =
      s"""cast(0.7213 as double) / (cast(1.0 as double)
         |  + cast(1.079 as double) / cast($m as double))
         |  * cast($m as double) * cast($m as double)
         |  * cast($denom as double) / cast(num as double)""".stripMargin
    sums.join(exact, "grp")
      .select(col("grp"),
        (lit(m.toLong) - col("present")).as("v_zero"),
        col("n_exact"),
        (col("num_present") + (lit(m.toLong) - col("present")) * denom)
          .as("num"))
      .select(col("grp"), col("v_zero"), col("n_exact"),
        expr(s"round($estExpr, 6)").as("est"),
        expr(s"round(abs(($estExpr) - cast(n_exact as double)) " +
          "/ cast(n_exact as double), 6)").as("rel_err"))
  }

  /** Exact two-sample Kolmogorov-Smirnov readout from per-(group,
    * value) counts — each group against the REST of the population:
    * D = max_v |cdfA(v)·m − cdfB(v)·n| / (n·m) with the numerator a
    * max over cross-multiplied bigint counts (no float CDFs to drift
    * between engines) and one double division at the end. Shared by
    * the batch t42 query and the streaming st38 state readout (whose
    * state IS the (group, value) count table). The global CDF runs on
    * the provably tiny distinct-value frame; per-group CDFs on a
    * group-partitioned window.
    */
  def ksFromCounts(psv: DataFrame, groupCol: String = "source",
      valueCol: String = "v", cntCol: String = "cnt"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = psv.select(col(groupCol).as("source"), col(valueCol).as("v"),
      col(cntCol).as("cnt"))
    val totals = p.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
    val grand = totals.agg(sum(col("n")).as("nn"))
    val gv = p.groupBy(col("v")).agg(sum(col("cnt")).as("gcnt"))
      .withColumn("gcdf", sum(col("gcnt")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val grid = totals.select(col("source"), col("n"))
      .crossJoin(broadcast(gv.select(col("v"), col("gcdf"))))
      .join(p, Seq("source", "v"), "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("acdf", sum(col("cnt")).over(
        Window.partitionBy(col("source")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grid.crossJoin(broadcast(grand))
      .withColumn("m", col("nn") - col("n"))
      .withColumn("diff",
        abs(col("acdf") * col("m") - (col("gcdf") - col("acdf")) * col("n")))
      .groupBy(col("source"), col("n"), col("m"))
      .agg(max(col("diff")).as("ks_num"))
      .select(col("source"), col("n"), col("m"), col("ks_num"),
        round(col("ks_num").cast("double")
          / (col("n") * col("m")).cast("double"), 6).as("ks"))
      .orderBy(col("source"))
  }
}
