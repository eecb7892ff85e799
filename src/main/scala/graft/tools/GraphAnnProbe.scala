package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall sweep for the graph-ANN beam search (s35/s36): measures
  * recall@5 vs brute force at sf0.01 across graph degree, seed
  * density, beam width, round count, and edge direction — the
  * evidence behind the registered configuration. Run:
  *   sbt "runMain graft.tools.GraphAnnProbe"
  */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.{CacheScope, Similarity}

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 50) // wider query set for stable recall
    val k = 5
    val scope = CacheScope.sessionScope(spark)
    val truth = scope.own(Similarity.bruteForceTopK(emb, queries, k)
      .select($"q_id", $"n_id").persist())
    val nTruth = truth.count()

    def recall(df: DataFrame): Double = {
      val hits = df.select($"q_id", $"n_id").join(truth, Seq("q_id", "n_id")).count()
      hits.toDouble / nTruth
    }

    for (graphK <- Seq(5, 10);
         undirected <- Seq(false, true);
         seedMod <- Seq(64, 16);
         beam <- Seq(8, 16);
         rounds <- Seq(2, 3)) {
      val g0 = Similarity.ivfKnnGraphTrainedFp(emb, graphK, nlist = 32,
          nprobe = 4)
        .select($"q_id".as("node"), $"n_id".as("edge_to"))
      val g = if (undirected)
        g0.unionByName(g0.select($"edge_to".as("node"), $"node".as("edge_to")))
          .distinct()
      else g0
      val gp = scope.own(g.persist())
      val r = recall(Similarity.graphBeamSearchOver(gp, emb, queries, k,
        beam = beam, rounds = rounds, seedMod = seedMod))
      println(f"graphK=$graphK%2d undirected=$undirected%5s seedMod=$seedMod%2d " +
        f"beam=$beam%2d rounds=$rounds%d  recall@5=$r%.3f")
      gp.unpersist()
    }
    spark.stop()
  }
}
