package graft.tools

import org.apache.spark.sql.SparkSession

/** Time SparkEntry queries under extra session confs — the experiment
  * harness for width/AQE sizing questions. Usage:
  *   SPARK_GRAFT_CPUS=32 \
  *   GRAFT_EXTRA_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=false" \
  *   runMain graft.tools.ConfProbe q44_triangles q48_khop_reach
  * Each query: 1 JIT warmup + GRAFT_CC_REPS timed reps, min reported.
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_CC_REPS", "3").toInt
    val extra = sys.env.getOrElse("GRAFT_EXTRA_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
      }
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-confprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        try {
          graft.operators.CacheScope.releaseSession(spark)
          spark.catalog.clearCache()
          graft.operators.CacheScope.releaseCheckpoints(spark)
        } catch { case _: Throwable => }
        dt
      }
      once() // JIT warmup
      val ts = (1 to reps).map(_ => once())
      println(f"[cp] $name%-32s min=${ts.min}%6.2f s  " +
        f"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
