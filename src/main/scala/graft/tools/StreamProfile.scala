package graft.tools

import org.apache.spark.sql.SparkSession

/** Timing experiments for the streaming queries: shuffle-partition and
  * no-data-microbatch sensitivity. Usage: runMain graft.tools.StreamProfile
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sprof] $name%-50s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    println("[sprof] events rows = " +
      spark.read.parquet(s"$dir/events.parquet").count())

    // warm once (session + stream machinery init)
    time("st01 warm (32 parts)")(graft.streaming.Streaming.hourlyStats(spark, dir).count())
    time("st01 again (32 parts)")(graft.streaming.Streaming.hourlyStats(spark, dir).count())

    spark.conf.set("spark.sql.shuffle.partitions", "8")
    time("st01 (8 parts)")(graft.streaming.Streaming.hourlyStats(spark, dir).count())

    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    time("st01 (8 parts, no noData batch)")(
      graft.streaming.Streaming.hourlyStats(spark, dir).count())
    time("st02 (8 parts, no noData batch)")(
      graft.streaming.Streaming.userRunningState(spark, dir).count())
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    time("st03 (8 parts)")(graft.streaming.Streaming.hourlyStatsWatermarked(spark, dir).count())
    time("st04 (state 8)")(graft.streaming.Streaming.clickViewJoin(spark, dir).count())
    time("st04 again (state 8)")(graft.streaming.Streaming.clickViewJoin(spark, dir).count())

    // dbscan in-bench-like conditions: fresh read, no pre-persisted input
    import org.apache.spark.sql.functions._
    val pts = graft.sources.Sources.events(spark, dir).select(
      col("value").as("x"),
      ((expr("ts div 1000000000") - lit(1704067200L)) / 3600.0).as("y"))
    time("dbscan mpp=2000 (cold read)")(
      graft.operators.DistributedDBSCAN.cluster(pts, 8.0, 8, 2000L).labeled.count())
    spark.catalog.clearCache()
    time("dbscan mpp=2000 (again)")(
      graft.operators.DistributedDBSCAN.cluster(pts, 8.0, 8, 2000L).labeled.count())

    spark.stop()
  }
}
