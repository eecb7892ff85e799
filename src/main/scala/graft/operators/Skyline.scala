package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier): the rows no other row
  * dominates, maximizing one dimension and minimizing the other.
  * Row s dominates row r iff s.maxv >= r.maxv AND s.minv <= r.minv
  * with at least one strict inequality; duplicates of the same
  * (maxv, minv) point never dominate each other, so all copies of an
  * undominated point survive.
  *
  * Scale shape — the classic two-phase distributed skyline:
  *   1. LOCAL: sort each partition by (maxv desc, minv asc)
  *      (`sortWithinPartitions` — a per-partition external sort, no
  *      shuffle, no global order) and sweep it with O(1) state: a row
  *      survives iff its minv is strictly below the best minv of any
  *      strictly-better maxv seen so far, and equals the best minv
  *      within its own maxv group. Local pruning is SAFE: a locally
  *      dominated row is dominated by a row that itself survives or is
  *      dominated transitively, and no global-skyline row can be
  *      locally dominated.
  *   2. GLOBAL: the surviving candidates — expected O(parts · log n)
  *      for non-adversarial data, worst-case the full skyline — are
  *      shuffled to one merge task and swept once more with the same
  *      kernel. That single task touches only candidates, never the
  *      corpus; at 100 TB the heavy work stays in phase 1's
  *      narrow scan.
  *
  * The output SET is partitioning-invariant (phase 1 removes only
  * globally-dominated rows), so the operator is deterministic under
  * any executor layout and a plain NOT EXISTS dominance query replays
  * it in the oracle engine. Comparisons only — no float arithmetic —
  * so double-typed dimensions carry no cross-engine drift.
  */
object Skyline {

  /** One streaming sweep over rows pre-sorted by (maxv desc, minv asc).
    * State: `bestHigher` = min minv over all strictly greater maxv
    * groups; `groupMax`/`groupMin` track the current maxv group and its
    * (first-seen = minimal) minv. Survivors: minv < bestHigher AND
    * minv == group minimum.
    */
  private def sweep(rows: Iterator[(Long, Double, Long)]): Iterator[(Long, Double, Long)] = {
    var bestHigher = Long.MaxValue   // min minv among strictly-higher maxv
    var groupMax = Double.NaN        // current maxv group
    var groupMin = Long.MaxValue     // min minv within the current group
    rows.flatMap { case row @ (_, maxv, minv) =>
      if (groupMax.isNaN || maxv != groupMax) { // entering a new maxv group
        bestHigher = math.min(bestHigher, groupMin)
        groupMax = maxv
        groupMin = minv // sorted minv asc => first row holds the group min
      }
      if (minv < bestHigher && minv == groupMin) Iterator.single(row)
      else Iterator.empty
    }
  }

  /** Skyline of `df` maximizing double column `maxCol` and minimizing
    * long column `minCol`; `keyCol` is carried through. Returns
    * (keyCol, maxCol, minCol) with the original column names.
    */
  def skyline2D(s: SparkSession, df: DataFrame, keyCol: String, maxCol: String,
      minCol: String): DataFrame = {
    import s.implicits._
    val typed: Dataset[(Long, Double, Long)] = df.select(
      col(keyCol).cast("long").as("_1"), col(maxCol).cast("double").as("_2"),
      col(minCol).cast("long").as("_3")).as[(Long, Double, Long)]
    val local = typed
      .sortWithinPartitions($"_2".desc, $"_3".asc)
      .mapPartitions(sweep)
    // repartition (a shuffle), NOT coalesce: coalesce(1) would fuse the
    // phase-1 sweep into the same single task and serialize the corpus
    // scan; the shuffle barrier keeps phase 1 wide and moves only the
    // surviving candidates to the one merge task.
    val global = local
      .repartition(1)
      .sortWithinPartitions($"_2".desc, $"_3".asc)
      .mapPartitions(sweep)
    global.toDF(keyCol, maxCol, minCol)
  }
}
