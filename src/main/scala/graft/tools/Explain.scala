package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for selected queries — the
  * explain-review loop: check PushedFilters reach the scan, small dims
  * broadcast, WholeStageCodegen spans are wide, no nested-loop joins
  * where an equi-join was intended.
  *
  * Usage: runMain graft.tools.Explain [queryName ...] (default: a
  * representative set)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q03_broadcast_join_agg", "q05_star_join_revenue",
        "q09_argmax_dedup", "s03_eps_degree", "d02_ngram_jaccard")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
