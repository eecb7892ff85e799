package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q45Probe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val li = s.read.parquet(s"$dir/lineitem.parquet").select($"l_returnflag".as("flag"),
      expr("cast(l_extendedprice as bigint)").as("v"))
    val agg = li.groupBy($"flag").agg(
      expr("percentile_approx(v, array(0.25D, 0.5D, 0.75D, 0.95D), 1000)").as("apx"),
      count(lit(1)).as("n"))
    val est = agg.select($"flag", $"n", posexplode($"apx"))
      .select($"flag", $"n", $"pos", $"col".as("est_v"))
    li.join(broadcast(est), "flag")
      .groupBy($"flag", $"pos", $"n", $"est_v")
      .agg(sum(when($"v" < $"est_v", 1L).otherwise(0L)).as("lt"),
           sum(when($"v" <= $"est_v", 1L).otherwise(0L)).as("le"))
      .withColumn("frac", element_at(array(lit(0.25),lit(0.5),lit(0.75),lit(0.95)), $"pos"+1))
      .withColumn("target", $"frac" * $"n")
      .withColumn("bound", $"n" / 1000.0)
      .orderBy("flag","pos")
      .show(20, false)
    s.stop()
  }
}
