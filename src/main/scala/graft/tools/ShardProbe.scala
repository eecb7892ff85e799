package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing breakdown for st58's phases: per-shard replica
  * builds (collect vectors / build+collect per-shard graph) vs the
  * streaming walk — the feedback loop for sizing the sharded serving
  * row.
  */
object ShardProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nShards = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-shard-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.{Mixture, Similarity}
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sp] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
          Mixture.rendezvousShardCol(col("vec_id"), nShards).as("shard"))
        .persist()
      t("cache emb")(emb.count())
      (0 until nShards).foreach { sh =>
        val sc = emb.filter(col("shard") === sh).drop("shard")
        t(s"shard$sh vectors")(sc.as[(Long, Array[Float])].collect())
        t(s"shard$sh graph")(
          Similarity.knnEdgesScaled(sc, 10, undirected = true)
            .as[(Long, Long)].collect())
      }
      t("full st58")(
        graft.streaming.Streaming.streamShardedGraphProbe(spark, dir,
          nShards = nShards).count())
      emb.unpersist()
      graft.operators.CacheScope.releaseSession(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
