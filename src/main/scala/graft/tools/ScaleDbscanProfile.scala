package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for dbscan_events on the scale-ladder corpora — which
  * stage goes superlinear at 10x (histogram? plan? local clustering?
  * merge?).
  */
object ScaleDbscanProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-scale-dbscan-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.core.{Rect, SpacePartitioner}
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sdp] $name%-45s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }
    val eps = 8.0; val cell = 2 * eps
    for (dir <- args) {
      println(s"[sdp] === $dir ===")
      val pts = graft.sources.Sources.events(spark, dir).select(
        $"value".as("x"),
        ((expr("ts div 1000000000") - lit(1704067200L)) / 3600.0).as("y"))
      pts.persist(); println("[sdp] n = " + pts.count())
      val hist = time("histogram collect") {
        pts.groupBy(
            graft.operators.DistributedDBSCAN.cornerExpr($"x", cell).as("cx"),
            graft.operators.DistributedDBSCAN.cornerExpr($"y", cell).as("cy"))
          .count().collect()
          .map(r => (Rect(r.getDouble(0), r.getDouble(1),
            r.getDouble(0) + cell, r.getDouble(1) + cell), r.getLong(2).toInt))
          .toSet
      }
      println(s"[sdp] cells = ${hist.size}")
      val plan = time("SpacePartitioner.partition")(
        SpacePartitioner.partition(hist, 2000L, cell))
      println(s"[sdp] partitions = ${plan.size}")
      val m = time("full cluster mpp=2000")(
        graft.operators.DistributedDBSCAN.cluster(pts, eps, 8, 2000L))
      time("labeled count")(println("[sdp] labeled = " + m.labeled.count()))
      pts.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
