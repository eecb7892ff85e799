package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries by name — the per-task feedback
  * loop between full Bench runs. Usage:
  *   runMain graft.tools.QueryTime q29_bucketed_join d08_dedup_pipeline
  * Each query runs twice (cold, then after clearCache) so one-time
  * fixture costs are visible separately from steady state.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-querytime")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"[qt] $name%-30s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
        spark.catalog.clearCache()
        graft.operators.CacheScope.releaseCheckpoints(spark)
      }
    }
    spark.stop()
  }
}
