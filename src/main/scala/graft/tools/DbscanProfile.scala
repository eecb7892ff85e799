package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DbscanProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dprof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }
    val pts = graft.sources.Sources.events(spark, dir).select(
      $"value".as("x"),
      ((expr("ts div 1000000000") - lit(1704067200L)) / 3600.0).as("y"))
    pts.persist().count()
    for (mpp <- Seq(20000L, 5000L, 2000L)) {
      val m = time(s"cluster mpp=$mpp") {
        val model = graft.operators.DistributedDBSCAN.cluster(pts, 8.0, 8, mpp)
        val n = model.labeled.count()
        (model.partitions.size, n)
      }
      println(s"[dprof]   partitions=${m._1} rows=${m._2}")
    }
    spark.stop()
  }
}
