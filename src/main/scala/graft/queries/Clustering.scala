package graft.queries

import graft.operators.DistributedDBSCAN
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Density clustering exposed as queries. Not SQL-expressible, so these
  * have no DuckDB oracle (driver records a rows-only check); golden-file
  * parity is covered by the ScalaTest suites instead.
  */
object Clustering {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: cluster the events stream in (value, hour-of-month) space.
    "dbscan_events" -> { (s, dir) =>
      import s.implicits._
      // (value, hours since 2024-01-01) space; ts read as epoch nanos.
      val pts = Relational.events(s, dir)
        .select(
          $"value".as("x"),
          ((expr("ts div 1000000000") - lit(1704067200L)) / 3600.0).as("y"))
      // maxPointsPerPartition sizes the local-clustering tasks: 2000
      // gives ~64 balanced tasks at sf0.1 (profiled 2.3s vs 6.2s at
      // 20000, where 8 oversized tasks starved the 32 cores) — the
      // same knob that bounds task memory at cluster scale.
      DistributedDBSCAN.cluster(pts, eps = 8.0, minPoints = 8,
        maxPointsPerPartition = 2000).labeled
        .orderBy("x", "y")
    },

    // Golden fixture end-to-end through the reader (path is sf-independent).
    "dbscan_golden" -> { (s, _) =>
      val pts = s.read.csv("/root/repo/src/test/resources/labeled_data.csv")
        .select(col("_c0").cast("double").as("x"), col("_c1").cast("double").as("y"))
      DistributedDBSCAN.cluster(pts, 0.3, 10, 250).labeled.orderBy("x", "y")
    })
}
