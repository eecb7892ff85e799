package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Evidence probe for the trained-ANN recall knob sweep (round-12
  * carried item): recall@10 vs exact cosine for the deterministic,
  * float-trained, and fixed-point-trained IVF coarse quantizers as
  * Lloyd iterations and sample size grow, plus the trained residual
  * IVF×PQ composition — the numbers AnnRecallSpec pins floors for.
  * Run: java -cp classes:jars graft.tools.AnnTrainProbe [sfDir]
  */
object AnnTrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ann-train-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions.col

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qmod = sys.env.getOrElse("GRAFT_ANN_QMOD", "50").toLong
    val queries = emb.filter(col("vec_id") % qmod === 0)
    val k = 10
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk(Similarity.bruteForceTopK(emb, queries, k))
    def recall(got: Map[Long, Set[Long]]) = {
      val rs = exact.map { case (q, ex) =>
        got.getOrElse(q, Set.empty).count(ex).toDouble / ex.size }
      rs.sum / rs.size
    }
    def r(tag: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rec = recall(topk(df))
      println(f"[ann] $tag%-46s recall@10 $rec%.3f  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    println(s"[ann] dir=$dir queries=${exact.size}")
    r("det ivf nlist=32 nprobe=4",
      Similarity.ivfTopK(emb, queries, k, nlist = 32, nprobe = 4))
    for (it <- Seq(10, 30); sn <- Seq(4096, 8192)) {
      r(s"trainedLocal iters=$it sampleN=$sn",
        Similarity.ivfTopKTrained(emb, queries, k, nlist = 32, nprobe = 4,
          iters = it, sampleN = sn))
      r(s"trainedFp    iters=$it sampleN=$sn",
        Similarity.ivfTopKTrainedFp(emb, queries, k, nlist = 32, nprobe = 4,
          iters = it, sampleN = sn))
    }
    for (np <- Seq(2, 4, 8, 16)) {
      r(s"det ivf nprobe=$np",
        Similarity.ivfTopK(emb, queries, k, nlist = 32, nprobe = np))
      r(s"trainedFp ivf nprobe=$np",
        Similarity.ivfTopKTrainedFp(emb, queries, k, nlist = 32, nprobe = np))
    }
    // multi-probe / soft assignment: scan budget per query is
    // nprobe x assign x (n / nlist) — (2,2) matches the (4,1) baseline
    for ((np, a) <- Seq((2, 2), (4, 2), (2, 3), (3, 2), (4, 4))) {
      r(s"trainedFp SOFT nprobe=$np assign=$a (budget ~${np * a}/32)",
        Similarity.ivfTopKTrainedFpSoft(emb, queries, k, nlist = 32,
          nprobe = np, assign = a))
    }
    // finer quantization at CONSTANT scan fraction (nprobe·assign/nlist
    // = 1/8 everywhere, the nlist=32/nprobe=4 budget) — the other way
    // to spend the same scan: more, smaller cells
    for ((nl, np, a) <- Seq((64, 8, 1), (64, 4, 2), (128, 16, 1), (128, 8, 2))) {
      r(s"trainedFp nlist=$nl nprobe=$np assign=$a (budget ${np * a}/$nl)",
        if (a == 1) Similarity.ivfTopKTrainedFp(emb, queries, k, nlist = nl, nprobe = np)
        else Similarity.ivfTopKTrainedFpSoft(emb, queries, k, nlist = nl,
          nprobe = np, assign = a))
    }
    r("residual trainedFp ivfxpq ADC-only (rerankC=0)",
      Similarity.ivfPqTopKResidualTrainedFp(emb, queries, k,
        nlist = 32, nprobe = 4, m = 8, ncode = 32, rerankC = 0))
    r("residual trainedFp ivfxpq rerank 4k (s24)",
      Similarity.ivfPqTopKResidualTrainedFp(emb, queries, k,
        nlist = 32, nprobe = 4, m = 8, ncode = 32))
    r("residual trainedFp ivfxpq rerank 8k",
      Similarity.ivfPqTopKResidualTrainedFp(emb, queries, k,
        nlist = 32, nprobe = 4, m = 8, ncode = 32, rerankC = 8 * k))
    spark.stop()
  }
}
