package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task accounting — separates scheduler/planning
  * overhead from executor compute for the bench's slowest rows.
  * For each named query prints: wall seconds, #jobs, #stages, #tasks,
  * summed executor task time, summed GC time. A query whose wall time
  * is several times its task time is bound by driver-side work
  * (Catalyst planning, job launch cadence), not by data.
  *
  * Usage: runMain graft.tools.JobProfile <query> [query ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobprofile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    val gcMillis = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
          gcMillis.addAndGet(t.taskMetrics.jvmGCTime)
        }
      }
    })
    println(f"${"query"}%-34s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s ${"task_s"}%8s ${"gc_s"}%6s")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { rep =>
        jobs.set(0); stages.set(0); tasks.set(0)
        taskNanos.set(0L); gcMillis.set(0L)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a beat so counters are complete
        Thread.sleep(400)
        println(f"$name%-34s $wall%8.2f ${jobs.get}%5d ${stages.get}%6d " +
          f"${tasks.get}%6d ${taskNanos.get / 1e9}%8.2f ${gcMillis.get / 1e3}%6.2f" +
          (if (rep == 1) "  (cold)" else ""))
        graft.operators.CacheScope.releaseSession(spark)
        spark.catalog.clearCache()
        graft.operators.CacheScope.releaseCheckpoints(spark)
      }
    }
    spark.stop()
  }
}
