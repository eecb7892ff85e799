package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for s33's JL two-stage ANN — the slowest board
  * entry (9.7 s at sf0.1): separates the projection scan, the coarse
  * candidate window, and the rerank. Usage: runMain graft.tools.JlProfile
  */
object JlProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-jlprofile")
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
      println(f"[jl] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("corpus count (scan baseline)") { emb.count() }
    val pre = emb.select(col("vec_id").as("n_id"),
      graft.operators.Similarity.jlProject(col("embedding"), 64, 16).as("n_jl"))
    (1 to 2).foreach { i =>
      time(s"projection scan only, rep$i") { pre.count() }
      time(s"projection + sum fold, rep$i") {
        pre.select(sum(element_at(col("n_jl"), 1))).collect()
      }
      time(s"full s33, rep$i") {
        graft.SparkEntry.queries("s33_jl_topk")(spark, dir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
