package graft.examples

import org.apache.spark.sql.SparkSession

/** spark.ml API example: fit the DBSCAN estimator, then transform NEW
  * points — the predict the reference declares but never implements
  * (reference: DBSCAN.scala:244-251).
  */
object PredictExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-predict-example")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val pts = spark.read.csv("/root/repo/src/test/resources/labeled_data.csv")
      .select($"_c0".cast("double").as("x"), $"_c1".cast("double").as("y"))

    val model = new graft.ml.DBSCANClustering()
      .setEps(0.3).setMinPoints(10).setMaxPointsPerPartition(250)
      .fit(pts)
    println(s"partitions=${model.partitions.size}")

    // one point inside a cluster, one in empty space
    val fresh = Seq((0.65, 2.0), (99.0, 99.0)).toDF("x", "y")
    model.transform(fresh).show()
    spark.stop()
  }
}
