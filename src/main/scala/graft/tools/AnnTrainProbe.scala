package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** One-off recall probe for the fixed-point IVF trainer: sweeps iters
  * (and nprobe for context) at sf0.001/sf0.01 to pick s23's training
  * depth with measured evidence (feeds PLANS.md; not part of the
  * registered surface).
  */
object AnnTrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val queries = emb.filter($"vec_id" % 50 === 0)
      val k = 10
      def topk(df: DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
      val exact = topk(Similarity.bruteForceTopK(emb, queries, k))
      def recall(got: Map[Long, Set[Long]]) = {
        val rs = exact.map { case (q, ex) =>
          got.getOrElse(q, Set.empty).count(ex).toDouble / ex.size }
        rs.sum / rs.size
      }
      println(s"== $dir (${emb.count()} vectors, ${exact.size} queries)")
      for (iters <- Seq(5, 10, 20, 40)) {
        val r = recall(topk(Similarity.ivfTopKTrainedFp(emb, queries, k,
          nlist = 32, nprobe = 4, iters = iters)))
        println(f"  fp iters=$iters%2d nprobe=4: recall@10 $r%.3f")
      }
      val rD = recall(topk(Similarity.ivfTopKTrained(emb, queries, k,
        nlist = 32, nprobe = 4)))
      println(f"  double-trained iters=10:    recall@10 $rD%.3f")
    }
    spark.stop()
  }
}
