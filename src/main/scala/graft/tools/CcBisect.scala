package graft.tools

import org.apache.spark.sql.SparkSession

/** Bisect the r16 ConnectedComponents rounds rewrite (lazy checkpoint ×
  * dropped largeStar distinct × round-width right-sizing) on the CC-heavy
  * queries, at the session's core width. Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.CcBisect [query...]
  * Each (query, combo) runs `reps` times after one JIT warmup run; the
  * MIN per combo is reported. Combos share one JVM so JIT/session state
  * is common-mode; combo order is rotated per rep to decorrelate drift.
  */
object CcBisect {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_CC_REPS", "3").toInt
    val queries = if (args.nonEmpty) args.toSeq
      else Seq("q74_entity_resolution", "q51_graph_components",
        "s32_knn_graph_components")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ccbisect")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // (label, eager, lsdistinct, rightsize)
    val combos = Seq(
      ("r16 lazy+nodist      ", false, false, false),
      ("r15 eager+dist       ", true, true, false),
      ("eager+nodist         ", true, false, false),
      ("lazy+dist            ", false, true, false),
      ("lazy+nodist+rightsize", false, false, true),
      ("eager+dist+rightsize ", true, true, true))
    def setCombo(c: (String, Boolean, Boolean, Boolean)): Unit = {
      System.setProperty("graft.cc.eager", c._2.toString)
      System.setProperty("graft.cc.lsdistinct", c._3.toString)
      System.setProperty("graft.cc.rightsize", c._4.toString)
    }
    queries.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        try {
          graft.operators.CacheScope.releaseSession(spark)
          spark.catalog.clearCache()
          graft.operators.CacheScope.releaseCheckpoints(spark)
        } catch { case _: Throwable => }
        (dt, n)
      }
      setCombo(combos.head); once() // JIT warmup, discarded
      val acc = scala.collection.mutable.Map.empty[String, List[Double]]
        .withDefaultValue(Nil)
      var rows = -1L
      (0 until reps).foreach { r =>
        val rot = combos.drop(r % combos.size) ++ combos.take(r % combos.size)
        rot.foreach { c =>
          setCombo(c)
          val (dt, n) = once()
          require(rows < 0 || rows == n, s"row count drift: $rows vs $n")
          rows = n
          acc(c._1) = dt :: acc(c._1)
        }
      }
      combos.foreach { c =>
        val ts = acc(c._1)
        println(f"[cc] $name%-28s ${c._1} min=${ts.min}%6.2f s  " +
          f"all=${ts.reverse.map(t => f"$t%.2f").mkString(",")}  rows=$rows")
      }
    }
    spark.stop()
  }
}
