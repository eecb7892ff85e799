package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of a SparkEntry query — the
  * .explain feedback loop the build rules ask for, as a main.
  * Usage: runMain graft.tools.PlanDump <queryName> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, dir)
    df.explain("formatted")
    spark.stop()
  }
}
