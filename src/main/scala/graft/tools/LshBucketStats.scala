package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for banded-LSH candidate growth: per-(band, bucket)
  * population histogram and the implied candidate-pair count
  * (sum n*(n-1)/2) for s09's corpus shape at each given dir — the
  * number that explains whether an LSH self-join scales linearly
  * (bucket populations bounded) or quadratically (a dominant direction
  * concentrates signatures as the corpus grows).
  *
  * Usage: runMain graft.tools.LshBucketStats <dir> [dir ...]
  *        [-- planesPerBand [bands]]
  */
object LshBucketStats {
  def main(args: Array[String]): Unit = {
    val (dirs, opts) = args.span(_ != "--")
    val r = opts.drop(1).headOption.map(_.toInt).getOrElse(16)
    val bands = opts.drop(2).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-lsh-bucket-stats")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val mask = if (r == 64) -1L else (1L << r) - 1L
    dirs.foreach { dir =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val base = emb.select($"vec_id".cast("long").as("vec_id"), $"embedding")
      val scaled = emb.select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x * lit(2.0f)).as("embedding"))
      val u = base.unionByName(scaled)
      val withBand = u.select($"vec_id",
          graft.operators.Similarity.hyperplaneBucket($"embedding", bands * r).as("sig"))
        .select($"vec_id", explode(sequence(lit(0), lit(bands - 1))).as("band"),
          $"sig")
        .withColumn("bucket", expr(s"shiftright(sig, band * $r)").bitwiseAND(lit(mask)))
      val h = withBand.groupBy($"band", $"bucket").agg(count(lit(1)).as("n"))
      val s = h.agg(sum($"n" * ($"n" - 1) / 2).as("cand"), max($"n").as("mx"),
        count(lit(1)).as("nb")).collect()(0)
      val top = h.orderBy($"n".desc).limit(5).collect()
        .map(x => s"(b${x.get(0)},${x.get(1)}:${x.get(2)})").mkString(" ")
      println(s"RESULT dir=$dir r=$r bands=$bands rows=${u.count()} " +
        s"candPairs=${s.get(0)} maxBucket=${s.get(1)} nBuckets=${s.get(2)} top5=$top")
    }
    spark.stop()
  }
}
