package graft.tools

import graft.functions.TextAnalysis
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the dedup hot paths (d02/d06) — find the
  * bottleneck before optimizing. Usage: runMain graft.tools.Profile
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[profile] documents rows = ${docs.count()}")

    // mutCorpus equivalent (NorthStar.mutCorpus is private)
    val toks = TextAnalysis.tokens($"text")
    val mut = docs.select($"doc_id", $"text").unionByName(
      docs.select(($"doc_id" + 100000).as("doc_id"),
        array_join(slice(toks, lit(1),
          greatest(floor(size(toks) * 0.8).cast("int"), lit(1))), " ").as("text")))

    time("mutCorpus materialize")(mut.count())

    // ---- d06 stages ----
    val sim = Dedup.withSimhash(mut, "text", "doc_id")
    time("simhash compute")(sim.count())
    val simP = sim.persist()
    time("simhash persist")(simP.count())
    val banded = simP.select($"id", $"simhash",
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_no"),
          shiftright($"simhash", b * 8).bitwiseAND(255).as("sig"))): _*)).as("b"))
      .select($"id", $"simhash", $"b.band_no", $"b.sig")
    time("banding")(banded.count())
    val joined = banded.as("x").join(banded.as("y"),
      col("x.band_no") === col("y.band_no") && col("x.sig") === col("y.sig") &&
        col("x.id") < col("y.id"))
    val nPairs = time("band self-join count")(joined.count())
    println(s"[profile] candidate pairs (pre-distinct) = $nPairs")
    val filtered = joined.select(col("x.id").as("id_a"), col("y.id").as("id_b"),
      bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .filter($"hamming" <= 3)
    val nSurvive = time("hamming-filtered count")(filtered.count())
    println(s"[profile] surviving pairs (pre-distinct) = $nSurvive")
    val nDistinct = time("distinct of survivors")(filtered.distinct().count())
    println(s"[profile] distinct pairs = $nDistinct")
    time("full d06")(Dedup.simhashNearPairs(mut, "text", "doc_id", 3).count())
    simP.unpersist()

    // ---- d02 stages ----
    val sh = Dedup.shingles(mut, "text", "doc_id", 3)
    time("shingles")(sh.count())
    val shP = sh.persist()
    time("shingles persist")(shP.count())
    val dfreq = shP.groupBy($"sh").agg(count(lit(1)).as("df"))
    val top = time("shingle df histogram")(
      dfreq.orderBy(desc("df")).limit(10).collect())
    println("[profile] top shingle dfs: " + top.map(_.getLong(1)).mkString(","))
    val expl = time("pair explode count")(
      shP.as("a").join(shP.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id")).count())
    println(s"[profile] exploded pairs = $expl")
    time("full d02")(Dedup.jaccardPairs(mut, "text", "doc_id", 3, 0.5).count())

    spark.stop()
  }
}
