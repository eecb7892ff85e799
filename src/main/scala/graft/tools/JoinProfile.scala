package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-microbatch progress breakdown for the stream-stream join —
  * drives the SAME stream as st04 (Streaming.clickViewJoinStream) so
  * the profile measures exactly what the query runs.
  */
object JoinProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val joined = graft.streaming.Streaming.clickViewJoinStream(spark, dir)
    val t0 = System.nanoTime()
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("jp").start()
    q.processAllAvailable()
    println(f"[jprof] total ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      f"rows=${spark.table("jp").count()}")
    q.recentProgress.foreach { p =>
      println(s"[jprof] batch ${p.batchId}: rows=${p.numInputRows} durationMs=${p.durationMs}")
      p.stateOperators.foreach(so => println(s"[jprof]   state: rowsTotal=${so.numRowsTotal} " +
        s"updated=${so.numRowsUpdated} removed=${so.numRowsRemoved} commitMs=${so.commitTimeMs}"))
    }
    q.stop()
    spark.stop()
  }
}
