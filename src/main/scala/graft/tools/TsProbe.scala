package graft.tools
import org.apache.spark.sql.SparkSession
object TsProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val ev = graft.sources.Sources.events(s, dir)
    ev.printSchema()
    ev.selectExpr("ts", "ts div 1000000000 as secs").show(3, false)
    println("stream:")
    graft.sources.Sources.eventsStream(s, dir).printSchema()
    s.stop()
  }
}
