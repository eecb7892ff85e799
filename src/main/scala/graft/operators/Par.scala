package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for single-file inputs.
  *
  * The bench/correctness fixtures are ONE parquet file with ONE row
  * group per table, so a scan plans a single task and every per-row
  * kernel before the first exchange (shingling, hashing, date math,
  * explode fan-outs) runs single-threaded no matter how many cores the
  * session has. [[spread]] round-robin-repartitions to the session's
  * default parallelism ONLY when the planned scan has fewer partitions
  * — at warehouse scale the scan is already wide and this is the
  * identity, so no production shuffle is ever added (the guard is what
  * keeps this scale-adaptive rather than a local[32] tuning).
  *
  * Value-safe by the board's own conventions: repartition is
  * row-preserving, and every consumer aggregates in exact integer /
  * decimal arithmetic or ranks with total tie-breaks (the queries are
  * already hash-green across different core counts and shuffle
  * widths, which is the partition-robustness this relies on).
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val parts = df.rdd.getNumPartitions
    if (parts >= sc.defaultParallelism) df
    else df.repartition(sc.defaultParallelism)
  }
}
