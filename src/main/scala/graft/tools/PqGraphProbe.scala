package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the PQ k-NN graph (s38, the CORPUS-SCALED
  * path since round 14) at a scale rung — which term makes the ladder
  * rise? Usage:
  *   GRAFT_PROBE_DIR=/tmp/graft_scale/x30 \
  *     sbt "runMain graft.tools.PqGraphProbe"
  *
  * Geometry, training, and routing are THE SHARED OPERATOR CODE
  * (scaledNlist / ivfTrainCentroidsFp hashSeed / firstNsSuperTable /
  * twoLevelRouted — what pqKnnGraphScaledFp executes), so those
  * timings can never desynchronize. The PQ downstream stages re-spell
  * Similarity.pqGraphFromRouted's pipeline WITH STAGE BOUNDARIES so
  * each persist/count isolates one term — keep them in lockstep with
  * that method (same CTE-by-CTE structure, reviewed together).
  */
object PqGraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_PROBE_DIR", "/tmp/graft_scale/x30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import graft.operators.{CacheScope, Similarity}

    def t[A](label: String)(f: => A): A = {
      val s0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - s0) / 1e9}%8.2f s")
      r
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val nlist = sys.env.get("GRAFT_PROBE_NLIST").map(_.toInt)
      .getOrElse(Similarity.scaledNlist(n))
    println(s"[probe] n = $n, nlist = $nlist")
    val scope = CacheScope.sessionScope(spark)

    // shared operator code: trainer, super table, two-level routing
    val trained = t("ivfTrainCentroidsFp(hashSeed)")(
      Similarity.ivfTrainCentroidsFp(emb, nlist, hashSeed = true))
    val (superRows, centRows) = t("firstNsSuperTable")(
      Similarity.firstNsSuperTable(trained,
        Similarity.scaledSuperList(trained.length)))
    val routed = Similarity.twoLevelRouted(emb, superRows, centRows,
      nprobe = 4, superProbe = 3, idCol = "vec_id", vecCol = "embedding",
      scope = scope)
    t("two-level routing (materialize)")(routed.count())

    // ---- pqGraphFromRouted's stages, spelled with boundaries ----
    import spark.implicits._
    val cent = broadcast(trained.toSeq.map { case (c, v) => (c, v.toSeq) }
      .toDF("c_id", "c_vec"))
    def qresOf(vec: org.apache.spark.sql.Column) = zip_with(vec, col("c_vec"),
      (a, b) => floor((a.cast("double") - b / 32768.0d) * 4096.0d).cast("long"))
    val assigned = scope.own(routed
      .select(col("id").as("n_id"),
        element_at(col("probes"), 1)("_1").as("c_id"), col("vec"))
      .join(cent, "c_id")
      .select(col("n_id"), col("c_id"), qresOf(col("vec")).as("qres"))
      .persist())
    t("assign + residual")(assigned.count())

    val rsample = t("codebook sample collect")(assigned
      .withColumn("h", (lit(3L) * (col("n_id") % 1000000007L) + 8L) % 1000000007L)
      .orderBy(col("h").asc, col("n_id").asc).limit(4096)
      .select(col("qres")).collect().map(_.getSeq[Long](0).toArray))
    val cb = t("pqTrainCodebookFp (driver)")(
      Similarity.pqTrainCodebookFp(rsample, 8, 32, 10))
    val ncw = cb.head.length
    val sub = cb.head.head.length
    val flat = cb.flatten.flatten

    import org.apache.spark.sql.graftbridge.Bridge
    val coded = assigned.withColumn("codes", Bridge.column(
      graft.functions.PqEncodeFp(Bridge.expression(col("qres")), flat, 8, ncw, sub)))
    t("encode (materialize count)")(coded.count())

    val qside = scope.own(routed
      .select(col("id").as("q_id"), col("vec"),
        explode(col("probes")("_1")).as("c_id"))
      .join(cent, "c_id")
      .select(col("q_id"), col("c_id"), qresOf(col("vec")).as("q_qres"))
      .persist())
    t("qside residuals")(qside.count())

    val topC = udaf(new graft.functions.TopKCosAgg(40),
      ExpressionEncoder[(Long, Double)]())
    val cand = qside.join(coded.select(col("n_id"), col("c_id"), col("codes")),
        Seq("c_id"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("adc_fp", Bridge.column(graft.functions.AdcFp(
        Bridge.expression(col("q_qres")), Bridge.expression(col("codes")),
        flat, 8, ncw, sub)))
      .filter(col("adc_fp").isNotNull)
      .groupBy(col("q_id"))
      .agg(topC(col("n_id"), -col("adc_fp").cast("double")).as("cand"))
    t("block join + ADC + topC")(cand.count())
    spark.stop()
  }
}
