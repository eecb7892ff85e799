package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time the session-overlap edge derivation (the shared upstream of
  * q44/q48/q51/q76/q77) stage by stage: sessionization window, cell
  * explode, the cell self-join, the distinct. Dev-only.
  * Usage: runMain graft.tools.EdgeProfile
  */
object EdgeProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-edgeprofile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def events: DataFrame = graft.sources.Sources.events(spark, dir)
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ep] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val secs = expr("ts div 1000000000")
      val w = Window.partitionBy($"user_id").orderBy(secs, $"event_id")
      val iv = events
        .withColumn("sec", secs)
        .withColumn("prev_s", lag($"sec", 1).over(w))
        .withColumn("ns",
          when($"prev_s".isNull || ($"sec" - $"prev_s") > 1800, 1).otherwise(0))
        .withColumn("sess", F.sum($"ns").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sess")
        .agg(F.min($"sec").as("st"), F.max($"sec").as("en"))
      time("sessionize (iv count)") { println("  iv=" + iv.count()) }
      val ivp = iv.persist()
      val cells = ivp.select($"user_id", $"st", $"en",
        explode(sequence(expr("st div 3600"), expr("en div 3600"))).as("cell"))
      time("cells count") { println("  cells=" + cells.count()) }
      val joined = cells.as("a").join(cells.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.user_id") < col("b.user_id") &&
            col("a.st") <= col("b.en") && col("b.st") <= col("a.en") &&
            expr("greatest(a.st, b.st) div 3600") === col("a.cell"))
        .select(col("a.user_id").as("ua"), col("b.user_id").as("ub"))
      time("cell self-join (pre-distinct)") { println("  pairs=" + joined.count()) }
      time("distinct") { println("  edges=" + joined.distinct().count()) }
      ivp.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
