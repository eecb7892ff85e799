package graft.queries

import graft.operators.DistributedDBSCAN
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Density clustering exposed as queries.
  *
  * dbscan_golden HAS a DuckDB oracle: cluster ids are canonicalized to
  * the cluster's minimum core point's coordinates (rep_x, rep_y), which
  * a recursive-CTE connected-components formulation reproduces exactly —
  * on this fixture every border point touches exactly one cluster and no
  * order-dependent noise materializes (graph labels == visit-order
  * labels; verified core/border/noise = 677/54/18 on both).
  *
  * dbscan_events stays rows-only: its 10k+ points make the O(n^2)
  * recursive reachability CTE impractical in the oracle engine.
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
    // Output canonicalized for the oracle: cluster id -> the cluster's
    // minimum core point's (x, y); noise rows carry nulls.
    "dbscan_golden" -> { (s, _) =>
      import s.implicits._
      val pts = s.read.csv("/root/repo/src/test/resources/labeled_data.csv")
        .select(col("_c0").cast("double").as("x"), col("_c1").cast("double").as("y"))
      val labeled = DistributedDBSCAN.cluster(pts, 0.3, 10, 250).labeled
      val reps = labeled.filter($"flag" === "core")
        .groupBy($"cluster")
        .agg(min(struct($"x", $"y")).as("rep"))
      labeled.join(reps, Seq("cluster"), "left")
        .select($"x", $"y",
          $"rep.x".as("rep_x"), $"rep.y".as("rep_y"), $"flag")
        .orderBy("x", "y")
    })

  val oracles: Map[String, String] = Map(
    "dbscan_golden" ->
      """WITH RECURSIVE pts AS (
        |  SELECT row_number() OVER (ORDER BY x, y) AS id, x, y FROM (
        |    SELECT cast(column0 as double) AS x, cast(column1 as double) AS y
        |    FROM read_csv('/root/repo/src/test/resources/labeled_data.csv',
        |                  header=false))),
        |nb AS (SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
        |  ON a.id <> b.id
        | AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 0.09),
        |deg AS (SELECT ia AS id, count(*) AS n FROM nb GROUP BY ia),
        |core AS (SELECT id FROM deg WHERE n + 1 >= 10),
        |ce AS (SELECT n.ia AS s, n.ib AS d FROM nb n
        |  JOIN core c1 ON c1.id = n.ia JOIN core c2 ON c2.id = n.ib),
        |reach AS (SELECT id AS src, id AS dst FROM core
        |  UNION SELECT r.src, ce.d FROM reach r JOIN ce ON ce.s = r.dst),
        |lab AS (SELECT src AS id, min(dst) AS rep FROM reach GROUP BY src),
        |bord AS (SELECT n.ia AS id, min(l.rep) AS rep FROM nb n
        |  JOIN lab l ON l.id = n.ib
        |  WHERE n.ia NOT IN (SELECT id FROM core) GROUP BY n.ia)
        |SELECT p.x, p.y, rp.x AS rep_x, rp.y AS rep_y,
        |  CASE WHEN l.id IS NOT NULL THEN 'core'
        |       WHEN b.id IS NOT NULL THEN 'border'
        |       ELSE 'noise' END AS flag
        |FROM pts p
        |LEFT JOIN lab l ON l.id = p.id
        |LEFT JOIN bord b ON b.id = p.id
        |LEFT JOIN pts rp ON rp.id = coalesce(l.rep, b.rep)
        |ORDER BY p.x, p.y""".stripMargin)
}
