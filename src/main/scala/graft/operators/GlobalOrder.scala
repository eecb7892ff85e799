package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering primitives: consecutive global rank and
  * NTILE banding over an arbitrary sort order WITHOUT a single-task
  * global sort.
  *
  * An unpartitioned `row_number()/ntile()` window plans as
  * `Exchange SinglePartition` + one sort task — fine for thousands of
  * rows, fatal for a corpus-scale ranking (1.5M+ rows through one task
  * at the 100x design point, unbounded at 100 TB). The two-pass shape
  * used here is the standard distributed fix (same skeleton as
  * [[Mixture.globalRunningSum]]):
  *
  *   1. `repartitionByRange` on the sort key: partition boundaries
  *      respect the global order, each partition sorts in parallel and
  *      `row_number` runs per-partition (partitioned window — no
  *      SinglePartition exchange over the data).
  *   2. per-partition counts (≤ nParts rows) get an exclusive prefix
  *      sum + grand total — a window over a provably tiny frame — and
  *      broadcast back; global rank = partition offset + local rank.
  *
  * Rank correctness does not depend on WHERE the sampled range
  * boundaries fall, only that they respect the sort order — which
  * range partitioning guarantees — so the sampling nondeterminism in
  * `repartitionByRange` never changes the output.
  */
object GlobalOrder {

  private val work = Seq("__pid", "__grank", "__total", "__cnt", "__offset")

  /** `df` + `__grank` (1-based consecutive global rank over `sortCols`)
    * + `__total` (grand total row count), both LongType.
    */
  private def rankedWithTotal(df: DataFrame, sortCols: Seq[Column],
                              nParts: Int, scope: CacheScope): DataFrame = {
    require(nParts > 0, s"nParts must be positive, got $nParts")
    work.foreach(c => require(!df.columns.contains(c),
      s"input must not already contain working column $c"))
    // persisted: BOTH passes (local ranks, per-partition counts) read
    // the same materialized range partitioning — one upstream scan
    // instead of two, and the partition boundaries the counts are
    // keyed by are the ones the ranks actually used (no reliance on
    // repartitionByRange's sampling being replay-identical across two
    // executions of the lineage)
    val ranged = scope.own(df.repartitionByRange(nParts, sortCols: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .persist())
    // pass 1: rank within each range partition — parallel
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val local = ranged.withColumn("__grank", row_number().over(wLocal).cast("long"))
    // pass 2: per-partition counts (≤ nParts rows) → exclusive prefix +
    // total, broadcast back. The unpartitioned window here is over the
    // tiny counts frame, never the data.
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset", coalesce(sum(col("__cnt")).over(wPrefix), lit(0L)))
      .withColumn("__total", sum(col("__cnt")).over(wAll))
      .select(col("__pid"), col("__offset"), col("__total"))
    local.join(broadcast(offsets), "__pid")
      .withColumn("__grank", col("__offset") + col("__grank"))
      .drop("__pid", "__offset")
  }

  /** Global consecutive 1-based rank (row_number semantics) over
    * `sortCols`, added as `rankName`. `sortCols` should be a total
    * order (include a tiebreaker) for a deterministic result.
    *
    * PERSISTS the range-partitioned intermediate for the two passes.
    * Under the default [[CacheScope.session]] the cache is tracked in
    * the per-session registry — reclaim it with
    * `CacheScope.releaseSession(spark)` (or pass an explicit scope and
    * `release()` it after the consuming action).
    */
  def globalRank(df: DataFrame, sortCols: Seq[Column], nParts: Int = 32,
                 rankName: String = "rank",
                 scope: CacheScope = CacheScope.session): DataFrame =
    rankedWithTotal(df, sortCols, nParts, scope)
      .drop("__total").withColumnRenamed("__grank", rankName)

  /** Global NTILE(k) over `sortCols`, added as `tileName` (LongType),
    * with exact SQL ntile semantics: base = n div k, rem = n mod k;
    * tiles 1..rem hold base+1 rows, tiles rem+1..k hold base. Pure
    * per-row arithmetic on (rank, n) — the rank is the only ordered
    * computation, and it is the two-pass parallel one above.
    * Same persist caveat as [[globalRank]]: pass a managed scope in
    * long-lived sessions.
    */
  def globalNtile(df: DataFrame, sortCols: Seq[Column], k: Int,
                  nParts: Int = 32, tileName: String = "tile",
                  scope: CacheScope = CacheScope.session): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    rankedWithTotal(df, sortCols, nParts, scope)
      .withColumn(tileName, expr(
        s"""CASE
           |  WHEN __total % $k = 0 THEN (__grank - 1) div (__total div $k) + 1
           |  WHEN __grank <= ((__total div $k) + 1) * (__total % $k)
           |    THEN (__grank - 1) div ((__total div $k) + 1) + 1
           |  ELSE (__total % $k)
           |    + (__grank - 1 - ((__total div $k) + 1) * (__total % $k)) div (__total div $k)
           |    + 1
           |END""".stripMargin))
      .drop("__grank", "__total")
  }

  /** Global INCLUSIVE running sum of `valueCol` (integral — the sum is
    * exact and order-independent) over the total order `sortCols`,
    * added as `sumName`. Same two-pass shape as [[globalRank]]: range
    * partition on the order, per-partition prefix sums in parallel,
    * then the ≤ nParts per-partition totals prefix-summed on the tiny
    * frame and broadcast back as offsets — the distributed scan
    * primitive behind sweep-line analytics (interval concurrency,
    * inventory balance), never a single-task sort.
    * Same persist caveat as [[globalRank]].
    */
  def globalRunningSum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                       sumName: String = "cum", nParts: Int = 32,
                       scope: CacheScope = CacheScope.session): DataFrame = {
    require(nParts > 0, s"nParts must be positive, got $nParts")
    (work :+ "__v" :+ "__cum").foreach(c => require(!df.columns.contains(c),
      s"input must not already contain working column $c"))
    // integral-only by contract: a float value would silently truncate
    // through the long widening below — fail loudly instead
    val vType = df.select(valueCol).schema.head.dataType
    require(Seq("byte", "short", "integer", "long").contains(vType.typeName),
      s"globalRunningSum requires an integral valueCol (exact, " +
        s"order-independent sum); got ${vType.typeName}")
    val ranged = scope.own(df.repartitionByRange(nParts, sortCols: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .withColumn("__v", valueCol.cast("long"))
      .persist())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__cum", sum(col("__v")).over(wLocal))
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__cnt"))
      .withColumn("__offset", coalesce(sum(col("__cnt")).over(wPrefix), lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(sumName, col("__offset") + col("__cum"))
      .drop("__pid", "__v", "__cum", "__offset")
  }
}
