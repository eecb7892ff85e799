package graft.tools

import graft.operators.{ConnectedComponents, GraphDBSCAN, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the composed clustering queries (s08/s10/
  * dbscan_events_sample) — find the dominant phase before optimizing.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.CosineDbscanProfile
  */
object CosineDbscanProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-cdprofile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cdp] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // --- s08 stages ---
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.select($"vec_id".cast("long").as("vec_id"), $"embedding")
    val scaled = emb.select(($"vec_id" + 100000L).as("vec_id"),
      transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    val corpus = base.unionByName(scaled)
    println(s"[cdp] corpus rows = ${corpus.count()}")

    val pairs = Similarity.lshNeighborPairs(corpus, minCosine = 0.3, nPlanes = 8)
    val np = time("lsh pairs count")(pairs.count())
    println(s"[cdp] lsh pairs = $np")

    val nb = pairs
      .select(col("id_a").cast("long").as("ia"), col("id_b").cast("long").as("ib"))
      .select(explode(array(
        struct(col("ia"), col("ib")),
        struct(col("ib").as("ia"), col("ia").as("ib")))).as("e"))
      .select(col("e.ia").as("ia"), col("e.ib").as("ib"))
      .persist()
    time("nb persist")(nb.count())
    val core = nb.groupBy(col("ia")).count()
      .filter(col("count") + 1 >= 3)
      .select(col("ia").as("id"))
      .persist()
    time("core agg")(core.count())
    val coreEdges = nb
      .join(core.select(col("id").as("ia")), "ia", "left_semi")
      .join(core.select(col("id").as("ib")), "ib", "left_semi")
    time("coreEdges count")(coreEdges.count())
    val coreLab = time("CC assign (build+exec)")(
      ConnectedComponents.assign(coreEdges, core).persist())
    time("coreLab count")(coreLab.count())
    val borderLab = nb
      .join(core.select(col("id").as("ia")), "ia", "left_anti")
      .join(coreLab.select(col("id").as("ib"), col("component").as("rep")), "ib")
      .groupBy(col("ia").as("id"))
      .agg(min(col("rep")).as("border_rep"))
    time("borderLab count")(borderLab.count())
    spark.catalog.clearCache()
    time("s08 full (steady)")(graft.SparkEntry.queries("s08_cosine_dbscan_lsh")(spark, dir).count())
    spark.catalog.clearCache()
    time("s10 full (steady)")(
      graft.SparkEntry.queries("s10_cosine_dbscan_banded")(spark, dir).count())
    spark.catalog.clearCache()

    // --- dbscan_events_sample stages ---
    val pts = graft.sources.Sources.events(spark, dir)
      .filter($"event_id" % 5 === 0)
      .select($"value".as("x"),
        ((expr("ts div 1000000000") - lit(1704067200L)) / 3600.0).as("y"))
    println(s"[cdp] sample pts = ${pts.count()}")
    val labeled = time("sample DistributedDBSCAN.cluster")(
      graft.operators.DistributedDBSCAN.cluster(pts, 8.0, 8, 500).labeled)
    time("sample labeled count")(labeled.count())
    spark.catalog.clearCache()
    time("dbscan_events_sample full")(
      graft.SparkEntry.queries("dbscan_events_sample")(spark, dir).count())
    spark.catalog.clearCache()
    time("dbscan_events full")(
      graft.SparkEntry.queries("dbscan_events")(spark, dir).count())
    spark.stop()
  }
}
