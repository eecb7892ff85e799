package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-microbatch progress breakdown for the stream-stream join. */
object JoinProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    def side(tpe: String, idAs: String, userAs: String, timeAs: String) =
      spark.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
        .parquet(dir)
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(idAs), col("user_id").as(userAs),
          timestamp_seconds(expr("ts div 1000000000")).as(timeAs))
        .withWatermark(timeAs, "1 hour")

    val joined = side("click", "c_id", "c_user", "c_time")
      .join(side("view", "v_id", "v_user", "v_time"),
        col("c_user") === col("v_user") && col("v_time") <= col("c_time") &&
          col("v_time") >= col("c_time") - expr("INTERVAL 1 HOUR"))
      .select(col("c_id"), col("v_id"), col("c_user").as("user_id"))

    val ckpt = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "jp_ckpt").toString
    val t0 = System.nanoTime()
    val q = joined.writeStream.outputMode("append").format("memory")
      .option("checkpointLocation", ckpt)
      .queryName("jp").start()
    q.processAllAvailable()
    println(f"[jprof] total ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=${spark.table("jp").count()}")
    q.recentProgress.foreach { p =>
      println(s"[jprof] batch ${p.batchId}: rows=${p.numInputRows} durationMs=${p.durationMs}")
      p.stateOperators.foreach(so => println(s"[jprof]   state: rowsTotal=${so.numRowsTotal} " +
        s"updated=${so.numRowsUpdated} removed=${so.numRowsRemoved} commitMs=${so.commitTimeMs}"))
    }
    q.stop()
    spark.stop()
  }
}
