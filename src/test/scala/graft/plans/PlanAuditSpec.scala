package graft.plans

import graft.operators.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression gate for the scale story: no registered batch query may
  * plan a CartesianProduct or BroadcastNestedLoopJoin — every distance/
  * similarity predicate must reach execution as a bucketed hash
  * equi-join — except the explicitly-intended brute-force baselines
  * below. Streaming queries are excluded (building them executes the
  * stream); they contain only watermarked equi/interval joins by
  * construction.
  */
class PlanAuditSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  /** Queries ALLOWED to nested-loop, each with why. The common shape:
    * a BroadcastNestedLoopJoin whose BUILD side is provably tiny
    * (bands, centroids, a scalar) streams the big side once — that is
    * the right plan, not a scale bug.
    */
  private val intendedBruteForce: Map[String, String] = Map(
    "s01_knn_bruteforce" -> ("the exact baseline ANN variants are judged against (broadcast " +
      "queries x corpus scan)"),
    "s06_cosine_dbscan" -> "the exact-graph correctness baseline; s08/s10 are the scale path",
    "d07_embedding_neardup" -> ("planted-duplicate harness with synthetic id blocking; s07/s09 " +
      "are the general path"),
    "q04_theta_band_join" -> ("documented broadcast band-containment shape: 5-row broadcast " +
      "band table, fact side streams once"),
    "q18_scalar_subquery" -> "scalar subquery compare = join against one broadcast row",
    "s04_ivf_topk" -> ("coarse quantizer: corpus x 32 broadcast centroids is the IVF assignment " +
      "step by construction"),
    "s23_ivf_trained_topk" -> ("s04's sanctioned assignment/probe shape with trained centroids " +
      "— corpus x 32 broadcast k-means centers"),
    "s30_knn_graph" -> ("corpus-scaled two-level routing: corpus x ceil(sqrt(nlist)) broadcast " +
      "SUPER-centroids (s39's sanctioned shrink of the s04 quantizer scan), then an equi-join " +
      "on the super id against the broadcast centroid table; the data-sized candidate join is a " +
      "shuffle EQUI-join on the cell id, merged by the bounded top-k aggregator"),
    "m13_constellation_recall" -> ("t30's scalar shape per lever arm: the ONE-ROW query-count " +
      "aggregate crossJoins the ONE-ROW matched-count aggregate; the data-sized work is m11's " +
      "df-capped posting equi-join per arm"),
    "s31_ivf_multiprobe" -> ("s23's sanctioned assignment/probe shape (corpus x 32 broadcast " +
      "trained centroids) with soft rn<=2 routing; the data-sized join is the c_id equi-join, " +
      "deduped on (q_id, n_id) before the exact rank"),
    "s32_knn_graph_components" -> ("s30's corpus-scaled two-level routing scan (corpus x " +
      "sqrt-nlist broadcast supers); the data-sized joins are the cell-id equi-join, the mutual " +
      "(q_id, n_id) self-equi-join, and the star-contraction equi-joins"),
    "t46_trained_classifier" -> ("t23's scalar shape inside the teacher (the per-doc score " +
      "table joins the broadcast ONE-ROW corpus-mean aggregate); the data-sized work is the " +
      "exploded feature scan against the 4096-row broadcast trained weight table and the " +
      "teacher's marginal equi-joins"),
    "s12_pq_topk" -> ("ADC by construction: one code-table scan x broadcast per-query LUTs " +
      "(plus the corpus x broadcast codebook encode step)"),
    "s13_pq_index_probe" -> ("same ADC shape as s12, reading the build-once code asset instead " +
      "of encoding inline"),
    "s15_ivf_pq_topk" -> ("composition of the two sanctioned shapes: corpus x 32 broadcast " +
      "centroids (s04's assignment/probe) + code scan x broadcast probe-LUT rows (s12's ADC); " +
      "the data-sized join — codes to probed lists — is an equi-join on c_id"),
    "s16_ivf_pq_residual" -> ("same sanctioned shapes as s15 over residual codes: corpus x 32 " +
      "broadcast centroids, residual-code scan x broadcast per-(query,list) LUTs; the " +
      "data-sized join is the c_id equi-join"),
    "s24_ivf_pq_trained" -> ("s16's sanctioned residual shapes with trained broadcast assets " +
      "(32 k-means centroids, m x ncode codebook); the data-sized join is the c_id equi-join"),
    "s20_filtered_ann" -> ("s15's sanctioned shapes verbatim (corpus x 32 broadcast centroids, " +
      "code scan x broadcast LUTs); the added label gate is an ordinary equi-semi-join pruning " +
      "the code table before the ADC fold"),
    "s17_sql_knn" -> ("SQL spelling of s01's exact brute-force baseline (5 broadcast queries x " +
      "corpus scan) — intentionally the same sanctioned shape"),
    "s21_binary_rerank" -> ("candidate stage: 5 broadcast query signatures x ONE 16-byte (id, " +
      "sig) scan — 1/32 of the s01 scan bytes; the rerank is an ordinary broadcast-candidate " +
      "equi-join on n_id"),
    "s22_matryoshka" -> ("coarse stage: 5 broadcast query prefixes x the 16-of-64-dim prefix " +
      "projection (1/4 of the s01 scan bytes); the rerank is the same broadcast-candidate " +
      "equi-join as s21"),
    "s25_sq8_rerank" -> ("candidate stage: 5 broadcast query code arrays x the int8-codes " +
      "projection (1/4 of the s01 scan bytes, integer dot scoring); the rerank is the same " +
      "broadcast-candidate equi-join as s21"),
    "s26_mips_topk" -> ("s25's sanctioned candidate shape verbatim (5 broadcast query code " +
      "arrays x the int8-codes projection); the rerank is the same broadcast-candidate " +
      "equi-join, scored by raw inner product"),
    "s19_semantic_dedup" -> ("s04's sanctioned coarse-assignment shape (corpus x 32 broadcast " +
      "centroids); the data-sized pair join is an equi-join on the cluster id"),
    "s18_hybrid_search" -> ("the vector half is the sanctioned 3-broadcast-queries x corpus " +
      "baseline (swap in s15's pruned ADC at corpus scale); the lexical half is a posting " +
      "equi-join"),
    "t19_temperature_mix" -> ("the |domains|-row weight table crossJoins the broadcast 1-row " +
      "weight-sum aggregate — both sides tiny by construction; the data-sized join is the " +
      "broadcast rate join on domain"),
    "t50_dedup_remix" -> ("t19's sanctioned mixture shape riding inside (the |domains|-row " +
      "weight table crossJoins the 1-row weight-sum aggregate); the data-sized work is d08's " +
      "banded candidate equi-join, the CC closure, and id-keyed source joins"),
    "d14_semantic_decontam" -> ("d10's size contract applied to embeddings: the caller vouches " +
      "the eval set is benchmark-sized, buying the exact one-scan x broadcast-eval argmax; the " +
      "unvouched path is the centroid-blocked equi-join (SemanticContaminationSpec)"),
    "t23_lm_perplexity" -> ("the per-doc score table joins the broadcast ONE-ROW corpus-mean " +
      "aggregate (t19's scalar shape; the constant join key folds to a trivially-true " +
      "condition); the data-sized joins are the broadcast marginal-count equi-joins"),
    "t30_hll_distinct" -> ("the 1-row register-sum aggregate crossJoins the 1-row exact-count " +
      "aggregate (t19's scalar shape — both sides single rows by construction); the data-sized " +
      "work is two partial-aggregatable hash aggregates"),
    "t33_sketch_overlap" -> ("the |sources|-row (20) KMV sketch table self-joins on src < src — " +
      "both sides k-long bottom-k arrays by construction; the data-sized work is the one-pass " +
      "map-side-combinable sketch aggregate"),
    "t34_bm25_topk" -> ("the posting table crossJoins the broadcast ONE-ROW (N, L) corpus " +
      "aggregate (t23's scalar shape); the data-sized work is the term posting equi-join and " +
      "hash aggregates"),
    "q57_gapfill_series" -> ("the generated dense calendar crossJoins the broadcast |types|-row " +
      "distinct-type table — both sides post-aggregate O(hours)/O(types) by construction; the " +
      "data-sized work is the one hour x type hash aggregate"),
    "t38_collocations" -> ("the filtered bigram table crossJoins the broadcast ONE-ROW " +
      "token-total and bigram-total aggregates (t34's scalar shape); the data-sized work is the " +
      "two token-stream hash aggregates and vocab-sized equi-joins"),
    "q58_decay_score" -> ("q18's scalar shape: the event projection joins the ONE-ROW broadcast " +
      "reference-hour aggregate; the data-sized work is the single groupBy(user) hash aggregate"),
    "q62_aqp_estimate" -> ("t30's scalar shape: the ONE-ROW sample aggregate crossJoins the " +
      "ONE-ROW exact aggregate — both sides single rows by construction; the data-sized work is " +
      "two partial-aggregatable scans"),
    "q63_trend" -> ("q18's scalar shape: the O(days x types) daily-count table crossJoins the " +
      "ONE-ROW broadcast min-day aggregate; the data-sized work is the single day x type hash " +
      "aggregate"),
    "q64_peak_concurrency" -> ("t30's scalar shape: the ONE peak row crossJoins the ONE-ROW " +
      "session-count aggregate; the data-sized work is the session window pass and the two-pass " +
      "range-partition running sum"),
    "t39_dedup_eval" -> ("t30's scalar shape: the ONE-ROW truth aggregate crossJoins the " +
      "ONE-ROW candidate-count aggregate; the data-sized work is the planted-pair posting join " +
      "and d04's banded candidate join"),
    "t40_lsh_tradeoff" -> ("t30's scalar shape x3 layouts: per layout the ONE-ROW " +
      "candidate-count aggregate crossJoins the ONE-ROW found-count aggregate, and the 3-row " +
      "union crossJoins the ONE-ROW truth count; the data-sized work is the three banded " +
      "candidate joins"),
    "q67_sketch_rollup" -> ("rollup levels run on the 2^p-row register table by construction; " +
      "the 'all' level's 1-row exact aggregate joins the 256-row register sum (t30's scalar " +
      "shape) — the data-sized work is the ONE fact-scan register aggregate"),
    "q69_share_ratio" -> ("q18's scalar shape: the 25-row nation-revenue table crossJoins the " +
      "ONE-ROW broadcast grand-total aggregate; the data-sized work is the single orders hash " +
      "aggregate"),
    "s27_kmeans_train" -> ("s04's sanctioned assignment shape (corpus x 32 broadcast trained " +
      "centroids); the readout is a 32-row aggregate"),
    "t42_ks_drift" -> ("the |sources|-row totals table crossJoins (a) the broadcast " +
      "distinct-length CDF frame and (b) the ONE-ROW grand-total aggregate — both provably tiny " +
      "by construction; the data-sized work is the one (source, length) count aggregate"),
    "s28_maxsim_rerank" -> ("s01's sanctioned candidate shape (5 broadcast full-vector queries " +
      "x corpus scan); the 4x4 sub-vector MaxSim runs only on the broadcast-candidate equi-join " +
      "rows"),
    "s29_ivf_recall_curve" -> ("the evaluation row composes two sanctioned shapes: s01's exact " +
      "arm (5 broadcast queries x corpus scan — the ground truth) and s04's corpus x 32 " +
      "broadcast centroid assignment; every per-arm hit count is an equi-join of two top-k sets"),
    "s33_jl_topk" -> ("s01's sanctioned candidate shape over the PROJECTED table: 5 broadcast " +
      "16-dim query projections x the corpus projection scan (1/4 of the s01 scan bytes, " +
      "integer L2 scoring); the rerank is the same broadcast-candidate equi-join as s21"),
    "s34_margin_pairs" -> ("s30's corpus-scaled two-level routing scan (corpus x sqrt-nlist " +
      "broadcast supers) building the kNN graph it scores; the margin stats and pair scoring " +
      "are id-keyed equi-joins over the O(n*k) graph"),
    "s35_graph_ann" -> ("two sanctioned shapes: s30's corpus-scaled two-level routing scan " +
      "(corpus x sqrt-nlist broadcast supers) building the graph, and the seed stage's 5 " +
      "broadcast queries x the 1/64 navigation slice (a fraction of s01's scan bytes); every " +
      "beam round is an id-keyed equi-join"),
    "s36_graph_ann_recall" -> ("the evaluation row composes three sanctioned shapes: s01's " +
      "exact arm (the ground truth), s30's corpus-scaled two-level routing scan building the " +
      "shared graph, and s35's seed slice per arm; every per-arm hit count is an equi-join of " +
      "two top-k sets"),
    "s37_graph_index_probe" -> ("s35's seed-stage shape only (5 broadcast queries x the 1/64 " +
      "navigation slice) — the graph itself is READ from the build-once parquet asset, no " +
      "routing scan on the query path; beam rounds are id-keyed equi-joins"),
    "t49_term_dispersion" -> ("t19's scalar shape: the (token, source) count table crossJoins " +
      "the broadcast ONE-ROW corpus-size aggregate; the data-sized work is the single (source, " +
      "token) hash aggregate and two bounded broadcast joins (top-50 tokens, |sources| sizes)"),
    "t51_ccnet_buckets" -> ("t23's sanctioned scalar shape inside the LM chain (the per-doc " +
      "surprisal table joins the broadcast marginal aggregates); the tertile thresholds are a " +
      "|langs|-row broadcast join over the bounded |langs|x256 histogram"),
    "t52_cluster_balance" -> ("s04's sanctioned assignment shape (corpus x 32 broadcast trained " +
      "centroids); the selection is a WindowGroupLimit rank filter, never a global sort"),
    "m15_clip_filter" -> ("t23's scalar shape: the per-pair score table joins the broadcast " +
      "ONE-ROW corpus-mean aggregate; the data-sized work is one pair scan with a " +
      "sequential-fold cosine"),
    "t53_source_kl" -> ("t19's scalar shape: the (source, token) count table crossJoins the " +
      "broadcast ONE-ROW corpus-total aggregate; the data-sized work is the exploded token " +
      "aggregate and the vocab-sized marginal equi-join"),
    "s38_pq_knn_graph" -> ("s30's corpus-scaled two-level routing scan (corpus x sqrt-nlist " +
      "broadcast supers); the data-sized candidate join is a shuffle EQUI-join on the cell id " +
      "carrying m-long PQ codes, scored by the codegen integer ADC and merged by the bounded " +
      "top-C aggregator; the rerank is id-keyed equi-joins over the bounded candidates"),
    "s39_knn_graph_2level" -> ("the two-level shrink of s30's routing: corpus x 6 broadcast " +
      "SUPER-centroids (strictly smaller than the sanctioned corpus x 32), then an equi-join on " +
      "the super id against the 32-row broadcast centroid table; the data-sized candidate join " +
      "is s30's cell-id shuffle equi-join verbatim"),
    "s40_routing_frontier" -> ("the evaluation row for the routing tradeoff: s29/s36's " +
      "sanctioned composition — the exact brute-force arm (ground truth), both sanctioned " +
      "routing scans (corpus x 32 centroids / corpus x 6 supers), and t30's scalar shape for " +
      "the per-arm count crossJoins; every data-sized join is an equi-join"),
    "d24_dedup_bias" -> ("t19's scalar shape: the |sources|-row per-source aggregate crossJoins " +
      "the broadcast ONE-ROW corpus-total aggregate; the data-sized work is d08's banded " +
      "candidate equi-join, the CC closure, and the id-keyed source join"),
    "d26_graph_upsert" -> ("s30's corpus-scaled two-level routing shape for BOTH the frozen " +
      "base index and the arriving shard (corpus x sqrt-nlist broadcast supers); the " +
      "merge-upsert itself is cell-id and q_id equi-joins over O(n*k) edge rows"),
    "s41_pq_graph_recall" -> ("the evaluation row for the PQ rerank budget: s29/s36's " +
      "sanctioned composition — the exact brute-force arm (ground truth) plus s38's sanctioned " +
      "routing shapes per arm; every hit count is an equi-join of two top-k sets"),
    "s42_graph_tombstone" -> ("s30's corpus-scaled two-level routing shape (corpus x sqrt-nlist " +
      "broadcast supers) building the frozen asset; the tombstone application is anti/semi " +
      "equi-joins on the id and the repair is the cell-id equi-join over surviving assignments"),
    "s43_tombstone_serving" -> ("s35's two sanctioned shapes verbatim (the corpus-scaled " +
      "routing scan building the asset, the 5-broadcast-queries x 1/64 seed slice) with the " +
      "scoring table anti-filtered to survivors; every beam round is an id-keyed equi-join"),
    "s44_graph_serve_upserted" -> ("d26's sanctioned frozen-quantizer routing shapes " +
      "(base-trained supers/centroids routing BOTH the base and the arriving shard) building " +
      "the maintained graph, plus s35's seed slice; the merge-upsert and every beam round are " +
      "id-keyed equi-joins"),
    "s50_generation_serving" -> ("s35's sanctioned seed shape (5 broadcast queries x the 1/64 " +
      "seed slice of base+arrivals) walking the STORED generation-2 asset the manifest routes " +
      "to; the WAL flush it ensures first is s49's all-equi-join application, and every beam " +
      "round is an id-keyed equi-join"),
    "s51_generation_masked_serving" -> ("s50's sanctioned shapes with the scoring table " +
      "anti-joined to the takedown mask (s43's contract on the routed generation); the mask " +
      "anti-join is an id-keyed equi-join, everything else is s50 verbatim"),
    "s47_scatter_gather_batch" -> ("two sanctioned navigation shapes: the router is 5 broadcast " +
      "queries x the O(corpus/routerMod) summary slice (s35's seed-stage fraction of an s01 " +
      "scan), and each routed arm runs s35's seed crossJoin over its 1/nShards slice; the " +
      "scatter is a left-semi equi-join, every beam round an id-keyed equi-join, the gather a " +
      "bounded window"),
    "s48_scatter_recall" -> ("the evaluation row composes s47's sanctioned navigation " +
      "shapes x3 breadth arms plus s01's exact truth arm (5 broadcast queries x corpus " +
      "scan); every hit count is an equi-join of two top-k sets"))

  /** Per-entry row bound for the vouched-tiny nested-loop side — the
    * prose above as a CHECKED invariant (round-13 verdict item 4): for
    * every sanctioned BNLJ the audit COUNTS the actual build side (for
    * a cartesian, the smaller side) and fails if it exceeds the bound.
    * Bound classes, from the prose: ONE-ROW scalar aggregates → 4;
    * bounded query/band/domain tables → 8..64; trained centroid /
    * codebook / weight tables → 4096 (the trainer's sampleN cap);
    * intentional brute-force BASELINES (s01/s06/s17/d07 and the eval
    * rows composing them) → corpus-sized at the audit sf, bounded at
    * 1100 so a silently grown fixture still fails.
    */
  private val buildSideRowBound: Map[String, Long] = Map(
    "s01_knn_bruteforce" -> 8, "s06_cosine_dbscan" -> 1100,
    "d07_embedding_neardup" -> 1100, "q04_theta_band_join" -> 8,
    "q18_scalar_subquery" -> 4, "s04_ivf_topk" -> 64,
    "s23_ivf_trained_topk" -> 64, "s30_knn_graph" -> 64,
    "m13_constellation_recall" -> 4, "s31_ivf_multiprobe" -> 64,
    "s32_knn_graph_components" -> 64, "t46_trained_classifier" -> 4096,
    "s12_pq_topk" -> 4096, "s13_pq_index_probe" -> 4096,
    "s15_ivf_pq_topk" -> 4096, "s16_ivf_pq_residual" -> 4096,
    "s24_ivf_pq_trained" -> 4096, "s20_filtered_ann" -> 4096,
    "s17_sql_knn" -> 1100, "s21_binary_rerank" -> 64,
    "s22_matryoshka" -> 64, "s25_sq8_rerank" -> 64,
    "s26_mips_topk" -> 64, "s19_semantic_dedup" -> 64,
    "s18_hybrid_search" -> 64, "t19_temperature_mix" -> 64,
    "t50_dedup_remix" -> 64, "t22_dsir_importance" -> 4096,
    "t23_lm_perplexity" -> 4096, "t25_histogram_threshold" -> 4096,
    "t28_novelty" -> 4096, "t30_hll_distinct" -> 4,
    "t31_hll_by_lang" -> 64, "t33_sketch_overlap" -> 32,
    "t36_langid_metrics" -> 64, "t39_dedup_eval" -> 32,
    "t40_lsh_tradeoff" -> 1100, "t41_zipf_slope" -> 4096,
    "t43_dup_ngram_fraction" -> 4, "t45_quality_classifier" -> 64,
    "q62_aqp_estimate" -> 4, "q65_ab_test" -> 64,
    "q69_share_ratio" -> 64, "s27_kmeans_train" -> 64,
    "t42_ks_drift" -> 4096, "s28_maxsim_rerank" -> 64,
    "s29_ivf_recall_curve" -> 1100, "s33_jl_topk" -> 64,
    "s34_margin_pairs" -> 64, "s35_graph_ann" -> 64,
    "s36_graph_ann_recall" -> 1100, "s37_graph_index_probe" -> 64,
    "t49_term_dispersion" -> 64, "t51_ccnet_buckets" -> 4096,
    "t52_cluster_balance" -> 64, "m15_clip_filter" -> 4,
    "t53_source_kl" -> 64, "s38_pq_knn_graph" -> 64,
    "s39_knn_graph_2level" -> 64, "s40_routing_frontier" -> 1100,
    "s41_pq_graph_recall" -> 1100, "d24_dedup_bias" -> 64,
    "d26_graph_upsert" -> 64, "s42_graph_tombstone" -> 64,
    "s43_tombstone_serving" -> 64, "s44_graph_serve_upserted" -> 64,
    "s50_generation_serving" -> 64, "s51_generation_masked_serving" -> 64,
    "s47_scatter_gather_batch" -> 64,
    "s48_scatter_recall" -> 1100,
    "d14_semantic_decontam" -> 64,
    "q57_gapfill_series" -> 8, "q58_decay_score" -> 4,
    "q63_trend" -> 4, "q64_peak_concurrency" -> 4,
    "q67_sketch_rollup" -> 64, "t34_bm25_topk" -> 4,
    "t38_collocations" -> 4)

  private def stripExchange(p: org.apache.spark.sql.execution.SparkPlan)
      : org.apache.spark.sql.execution.SparkPlan = p match {
    case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
      stripExchange(b.child)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      stripExchange(r.child)
    case i: org.apache.spark.sql.execution.InputAdapter => // codegen boundary above the exchange
      stripExchange(i.child)
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
      stripExchange(w.child)
    case other => other
  }

  test("every sanctioned nested-loop side is ACTUALLY tiny (counted against its bound)") {
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // AQE off so the physical tree is traversable (the string test above
    // audits the AQE plan; the shapes are identical at this sf)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val violations = intendedBruteForce.keys.toSeq.sorted.flatMap { name =>
        try {
          val bound = buildSideRowBound.getOrElse(name, -1L)
          val plan = graft.SparkEntry.queries(name)(spark, dir)
            .queryExecution.executedPlan
          val counts: Seq[Long] = plan.collect {
            case j: BroadcastNestedLoopJoinExec =>
              val side = stripExchange(
                if (j.buildSide == BuildLeft) j.left else j.right)
              Seq(side.execute().count())
            case c: CartesianProductExec =>
              Seq(math.min(stripExchange(c.left).execute().count(),
                stripExchange(c.right).execute().count()))
          }.flatten
          graft.operators.CacheScope.releaseSession(spark)
          spark.catalog.clearCache()
          if (bound < 0 && counts.nonEmpty)
            Some(s"$name: whitelisted but carries no buildSideRowBound entry")
          else counts.filter(_ > bound).headOption
            .map(c => s"$name: nested-loop side has $c rows > bound $bound")
        } catch {
          case e: Throwable => Some(s"$name: audit could not count a side: $e")
        }
      }
      violations shouldBe empty
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("no unintended cartesian or nested-loop join in any batch query plan") {
    val skip = (n: String) => n.startsWith("st") // streams execute on build
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip)
      .flatMap { name =>
        val plan = graft.SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        val bad = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (bad && !intendedBruteForce.contains(name)) Some(name) else None
      }
    offenders shouldBe empty
  }
}
