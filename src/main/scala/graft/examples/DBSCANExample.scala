package graft.examples

import graft.operators.DistributedDBSCAN
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end example: csv in -> distributed DBSCAN -> labeled csv out.
  * Mirrors the reference's README usage (reference: README.md:73-85).
  *
  * Usage: runMain graft.examples.DBSCANExample <in.csv> <outDir> [eps minPoints maxPPP]
  */
object DBSCANExample {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val eps = if (args.length > 2) args(2).toDouble else 0.3
    val minPoints = if (args.length > 3) args(3).toInt else 10
    val maxPPP = if (args.length > 4) args(4).toLong else 250L

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-dbscan-example")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val points = spark.read.csv(in)
      .select(col("_c0").cast("double").as("x"), col("_c1").cast("double").as("y"))

    val model = DistributedDBSCAN.cluster(points, eps, minPoints, maxPPP)
    model.labeled.write.mode("overwrite").option("header", "true").csv(out)

    println(s"partitions=${model.partitions.size}")
    model.labeled.groupBy("cluster", "flag").count()
      .orderBy("cluster", "flag")
      .collect()
      .foreach(r => println(s"cluster=${r.get(0)} flag=${r.get(1)} n=${r.get(2)}"))
    spark.stop()
  }
}
