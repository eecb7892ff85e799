package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE json line with per-query seconds.
  * A short untimed warmup (session init, codegen, parquet footer reads)
  * runs first so per-query numbers measure the queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: exercise codegen, shuffle machinery, and each table's footer.
    spark.range(10000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1000).count()
      catch { case _: Throwable => }
    }
    // Streaming machinery init (microbatch planner, state store provider)
    // costs ~2.5s once per session; pay it on a 100-row synthetic stream
    // so per-query numbers measure the queries.
    try {
      val warmDir = java.nio.file.Files.createTempDirectory("graft_warmup").toString
      spark.range(100).selectExpr(
        "id as event_id", "1704067200000000000L + id * 1000000000L as ts",
        "id % 10 as user_id", "'w' as event_type",
        "cast(id as double) as value", "'{}' as props")
        .write.mode("overwrite").parquet(s"$warmDir/events.parquet")
      graft.streaming.Streaming.hourlyStats(spark, warmDir).count()
    } catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Operators persist() intermediates for intra-query reuse; drop
      // them between queries so each is measured independently (no
      // cross-query cache hits, no accumulating executor memory).
      try spark.catalog.clearCache() catch { case _: Throwable => }
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
