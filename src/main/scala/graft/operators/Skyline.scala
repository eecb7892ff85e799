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

  /** 3-D skyline — maximize double `maxCol`, minimize long `minCol`,
    * minimize string `minStrCol` (lexicographic). The 2-D sorted sweep
    * does not generalize past two dimensions, so this is the GENERAL
    * skyline engine: dominance-buffer maintenance (the block-nested-
    * loop skyline) — insert a point unless a buffered candidate
    * dominates it, evicting the candidates it dominates. The buffer IS
    * the running skyline (order-independent, duplicates of undominated
    * points all survive — the st27 streaming frontier state machine,
    * here per partition), so the same two-phase reduction applies:
    * local buffers over `sortWithinPartitions(maxCol desc)` input
    * (descending first-dim makes early points likely dominators, the
    * classic BNL presort), then one candidates-only shuffle and a
    * final buffer pass. Comparisons only — portable to the NOT EXISTS
    * oracle bit-for-bit.
    */
  def skyline3D(s: SparkSession, df: DataFrame, keyCol: String, maxCol: String,
      minCol: String, minStrCol: String): DataFrame = {
    import s.implicits._
    def dom(a: (Long, Double, Long, String), b: (Long, Double, Long, String)): Boolean =
      a._2 >= b._2 && a._3 <= b._3 && a._4 <= b._4 &&
        (a._2 > b._2 || a._3 < b._3 || a._4 < b._4)
    val prune: Iterator[(Long, Double, Long, String)] =>
        Iterator[(Long, Double, Long, String)] = { it =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long, String)]
      it.foreach { p =>
        if (!buf.exists(q => dom(q, p))) {
          val survivors = buf.filterNot(q => dom(p, q))
          buf.clear(); buf ++= survivors; buf += p
        }
      }
      buf.iterator
    }
    val typed = df.select(col(keyCol).cast("long").as("_1"),
        col(maxCol).cast("double").as("_2"), col(minCol).cast("long").as("_3"),
        col(minStrCol).cast("string").as("_4"))
      .as[(Long, Double, Long, String)]
    typed.sortWithinPartitions($"_2".desc, $"_3".asc, $"_4".asc)
      .mapPartitions(prune)
      .repartition(1)
      .sortWithinPartitions($"_2".desc, $"_3".asc, $"_4".asc)
      .mapPartitions(prune)
      .toDF(keyCol, maxCol, minCol, minStrCol)
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
