package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for training-data pipelines.
  *
  * All of these are shuffle-shaped for the 100 TB design point:
  *   - exact dedup is one hash aggregate (map-side partial combine);
  *   - near-dup never goes all-pairs: candidates come from an equi-join
  *     on shingle / band / sub-band keys, so the shuffle moves
  *     O(sum of posting-list sizes), not O(n^2) — the standard
  *     MinHash-LSH banding construction (Broder 1997; Leskovec et al.,
  *     "Mining of Massive Datasets" ch. 3) and SimHash pigeonhole
  *     banding (Manku et al., WWW'07).
  *
  * Hashing is the portable polynomial rolling hash from
  * [[graft.functions.TextAnalysis.rollingHash]] — pure integer
  * arithmetic, so every stage is reproducible in the DuckDB oracle.
  */
object Dedup {

  private val P = 1000000007L

  private implicit class Dollar(private val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** Exact duplicate groups by content hash: one row per distinct text,
    * with the smallest id as canonical and the copy count.
    */
  def exactDuplicates(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_md5"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Distinct hashed word `n`-gram shingles per document:
    * (id, shingle_hash) pairs — the posting list both Jaccard and
    * MinHash build on.
    */
  def shingles(docs: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // Documents shorter than n tokens contribute their whole text as the
    // single shingle (also keeps ANSI-mode element_at in bounds).
    val grams = when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array(concat_ws(" ", toks)))
    docs.select(col(idCol).as("id"), explode(array_distinct(grams)).as("shingle"))
      .select($"id", TextAnalysis.stringHash($"shingle", P).as("sh"))
      .distinct()
  }

  /** Pairwise n-gram Jaccard similarity for all pairs sharing >= 1
    * shingle, filtered to `minJaccard`. Pure relational plan:
    * posting-list self-equi-join -> pair intersection counts ->
    * join per-doc set sizes.
    */
  def jaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, minJaccard: Double = 0.6): DataFrame = {
    val sh = shingles(docs, textCol, idCol, n).persist()
    val sizes = sh.groupBy($"id").agg(count(lit(1)).as("set_size"))
    val inter = sh.as("a").join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select($"id".as("id_a"), $"set_size".as("size_a")), "id_a")
      .join(sizes.select($"id".as("id_b"), $"set_size".as("size_b")), "id_b")
      .withColumn("jaccard",
        round($"n_inter".cast("double") / ($"size_a" + $"size_b" - $"n_inter"), 6))
      .filter($"jaccard" >= minJaccard)
      .select($"id_a", $"id_b", $"n_inter", $"jaccard")
  }

  /** k MinHash values per document over its shingle set:
    * minhash_i = min over shingles of ((2i+1)*sh + i*i + 7) mod P.
    * Returned as an array column `minhashes`.
    *
    * Aggregated with the typed [[graft.functions.MinHashAgg]] — a
    * distributive O(k)-state aggregate with map-side partial combine,
    * so a document's shingle set is never materialized (a collect_set
    * formulation would ship the whole set per document through the
    * shuffle).
    */
  def minhashes(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 16, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits.{newLongEncoder, newProductEncoder, newLongSeqEncoder}
    shingles(docs, textCol, idCol, n)
      .select(col("id").cast("long").as("id"), col("sh"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.MinHashAgg(k, P).toColumn.name("minhashes"))
      .toDF("id", "minhashes")
  }

  /** LSH band signatures: the k minhashes split into `bands` bands of
    * k/bands rows each, concatenated to one string key per band.
    * Documents agreeing on any band are near-dup candidates.
    */
  def lshBands(mh: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      concat_ws("-",
        (0 until rows).map(r => element_at($"minhashes", b * rows + r + 1)): _*).as(s"band$b")
    }
    mh.select($"id" +: bandCols: _*)
  }

  /** Candidate pairs sharing >= 1 LSH band, with the estimated
    * similarity = fraction of agreeing minhashes.
    */
  def lshCandidatePairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3): DataFrame = {
    val mh = minhashes(docs, textCol, idCol, k, n).persist()
    val banded = lshBands(mh, k, bands)
      .select($"id", explode(array((0 until bands).map(b =>
        struct(lit(b).as("band_no"), col(s"band$b").as("sig"))): _*)).as("b"))
      .select($"id", $"b.band_no", $"b.sig")
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band_no") === col("y.band_no") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    pairs
      .join(mh.select($"id".as("id_a"), $"minhashes".as("mh_a")), "id_a")
      .join(mh.select($"id".as("id_b"), $"minhashes".as("mh_b")), "id_b")
      .withColumn("est_sim", round(
        size(filter(zip_with($"mh_a", $"mh_b", (a, b) => a === b), x => x))
          .cast("double") / k, 6))
      .select($"id_a", $"id_b", $"est_sim")
  }

  /** 32-bit SimHash per document (Charikar 2002): bit b is set iff more
    * token hashes have bit b set than not. 32 bits because the portable
    * rolling hash lives below 2^30. Single pass over the token hashes:
    * an `aggregate` accumulates the 32 per-bit counts as an array, so
    * the hash array is evaluated once per row (the intermediate column
    * is non-cheap, which keeps CollapseProject from inlining it).
    * Bit extraction uses floor(h / 2^b) % 2 — exact in doubles below
    * 2^52, hence portable to any engine.
    */
  def withSimhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashes = transform(TextAnalysis.tokens(col(textCol)),
      t => TextAnalysis.stringHash(t, P))
    val bitAt = (h: Column, b: Column) =>
      floor(h.cast("double") / pow(lit(2.0), b)).cast("long") % 2
    val zero32 = transform(sequence(lit(0), lit(31)), _ => lit(0L))
    docs
      .withColumn("__hashes", hashes)
      .withColumn("__counts",
        aggregate($"__hashes", zero32,
          (acc, h) => zip_with(acc, sequence(lit(0), lit(31)), (c, b) => c + bitAt(h, b))))
      .withColumn("simhash",
        aggregate(
          zip_with($"__counts", sequence(lit(0), lit(31)), (c, b) =>
            when(c * 2 > size($"__hashes"), pow(lit(2.0), b).cast("long")).otherwise(0L)),
          lit(0L), (acc, x) => acc + x))
      .select(col(idCol).as("id"), $"simhash")
  }

  /** Near-duplicate pairs by SimHash hamming distance <= maxHamming,
    * found via 8-bit sub-band blocking: two 32-bit hashes within
    * hamming 3 must agree on at least one of 4 disjoint 8-bit bands
    * (pigeonhole), so candidates come from 4 equi-joins, never a
    * cross join.
    */
  def simhashNearPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    // persist: the signature computation is a non-codegen higher-order
    // expression and feeds BOTH sides of the self-join
    val withSim = withSimhash(docs, textCol, idCol).persist()
    val banded = withSim.select($"id", $"simhash",
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band_no"),
            shiftright($"simhash", b * 8).bitwiseAND(255).as("sig"))): _*)).as("b"))
      .select($"id", $"simhash", $"b.band_no", $"b.sig")
    banded.as("x").join(banded.as("y"),
        col("x.band_no") === col("y.band_no") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter($"hamming" <= maxHamming)
      .select($"id_a", $"id_b", $"hamming")
  }
}
