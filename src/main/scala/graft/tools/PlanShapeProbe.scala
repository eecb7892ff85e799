package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints shuffle/broadcast/scan counts per query plan — the numbers
  * PlanShapeSpec pins. SPARK_GRAFT_ONLY filters (comma list).
  */
object PlanShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          def c(p: String) = p.r.findAllIn(plan).length
          val nsh = c("Exchange hashpartitioning|Exchange rangepartitioning" +
            "|Exchange SinglePartition")
          println(f"$name%-28s shuffles=$nsh%2d " +
            f"bcast=${c("BroadcastExchange")}%2d scans=${c("FileScan|BatchScan")}%2d " +
            f"inmem=${c("InMemoryTableScan")}%2d sorts=${c("\\bSort\\b")}%2d")
        } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(80)}") }
      }
    spark.stop()
  }
}
