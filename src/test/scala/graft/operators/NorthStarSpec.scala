package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TextAnalysisSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counting and rolling hash") {
    val df = Seq((1L, "the quick fox"), (2L, "  a  b  ")).toDF("doc_id", "text")
    val got = df.select($"doc_id",
      TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.rollingHash($"text").as("h")).collect()
    got.map(r => (r.getLong(0), r.getInt(1))) shouldBe Array((1L, 3), (2L, 2))
    // rolling hash of "ab" = ('a'*31 + 'b') % p = 97*31+98
    val h = Seq(Tuple1("ab")).toDF("text")
      .select(TextAnalysis.rollingHash($"text")).head.getLong(0)
    h shouldBe (97L * 31 + 98)
  }

  test("native RollingHash equals the interpreted fold (incl. unicode)") {
    val samples = Seq("hello", "a", "the quick brown fox", "tschüß", "中文 text", "")
    val df = samples.map(Tuple1(_)).toDF("text")
    val got = df.select(TextAnalysis.rollingHash($"text")).collect().map(_.getLong(0))
    val expected = df.select(
      aggregate(
        transform(split($"text", ""), c => ascii(c).cast("long")),
        lit(0L), (acc, code) => (acc * 31 + code) % 1000000007L)).collect().map(_.getLong(0))
    // NB: the HOF baseline splits into Java chars; for BMP strings (all
    // test data) this equals code points.
    got.toSeq shouldBe expected.toSeq
  }

  test("BPE-ish token count equals the reference regex scan") {
    // the RE2-subset pattern the oracle runs, with \s expanded to
    // RE2's exact class (Java's \s differs on \v)
    val p = java.util.regex.Pattern.compile(
      " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\f\r]+")
    def ref(s: String): Long = {
      val m = p.matcher(s); var n = 0L
      while (m.find()) n += 1
      n
    }
    val samples = Seq("", "hello world", "  double  spaced ", "don't stop",
      "x2 y-3 = 4.5!", "tabs\tand\nnewlines", "trailing space ", " lead",
      "...---...", "a1b2c3", "café au lait", "100,000 items (2 of 3)")
    samples.foreach { s =>
      graft.functions.TextKernels.bpeTokenCount(s) shouldBe ref(s)
    }
  }

  test("winnowing guarantee: shared substring of length >= w+k-1 shares a fingerprint") {
    val k = 5; val w = 4
    val shared = "the common stretch of text both documents contain"
    val a = "left prefix AAA " + shared + " right tail AAA"
    val b = "different BBBB lead-in " + shared + " other ending ZZZ"
    val fa = graft.functions.TextKernels.winnowedHashes(a, k, w).toSet
    val fb = graft.functions.TextKernels.winnowedHashes(b, k, w).toSet
    fa.intersect(fb) should not be empty
    // density: ~2/(w+1) of k-grams selected, never more than all
    val m = a.codePointCount(0, a.length) - k + 1
    fa.size should be <= m
    fa.size.toDouble / m should be < 0.8
    // disjoint texts share nothing
    val fc = graft.functions.TextKernels.winnowedHashes(
      "zq zq zq completely unrelated 12345 !!!", k, w).toSet
    fa.intersect(fc) shouldBe empty
  }

  test("stopword count and quality score bounds") {
    val df = Seq(Tuple1("the cat and the hat")).toDF("text")
    df.select(TextAnalysis.stopwordCount($"text", Seq("the", "and")))
      .head.getLong(0) shouldBe 3
    val score = df.select(TextAnalysis.qualityScore($"text", Seq("the", "and")))
      .head.getDouble(0)
    score should (be >= 0.0 and be <= 1.0)
  }
}

class DedupSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
    (3L, "alpha beta gamma delta epsilon"), // near dup of 1
    (4L, "one two three four five six seven")).toDF("doc_id", "text")

  test("exact duplicates collapse by content hash") {
    val got = Dedup.exactDuplicates(docs, "text", "doc_id").collect()
    got.length shouldBe 3
    val dup = got.find(_.getLong(2) == 2L).get
    dup.getLong(1) shouldBe 1L // canonical = min id
  }

  test("jaccard pairs find the near-dup, not the unrelated doc") {
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L)) // identical => jaccard 1
    pairs should contain((1L, 3L)) // prefix => 3/4
    pairs.flatMap(p => Set(p._1, p._2)) should not contain 4L
  }

  test("minhash signatures: identical docs agree, LSH finds them") {
    val mh = Dedup.minhashes(docs, "text", "doc_id", k = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    mh(1L) shouldBe mh(2L)
    mh(1L) should not be mh(4L)
    val cands = Dedup.lshCandidatePairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    cands.find(c => c._1 == 1L && c._2 == 2L).get._3 shouldBe 1.0
  }

  test("simhash: identical docs equal; near dups close in hamming") {
    val sh = Dedup.withSimhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sh(1L) shouldBe sh(2L)
    java.lang.Long.bitCount(sh(1L) ^ sh(3L)) should be < 16
    val pairs = Dedup.simhashNearPairs(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((1L, 2L))
  }
}

class SimilaritySpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(2.0f, 0.0f, 0.0f)), // same direction as 0
    (2L, Array(0.0f, 1.0f, 0.0f)), // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f))) // opposite
    .toDF("vec_id", "embedding")

  test("cosine basics") {
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    c((0L, 1L)) shouldBe 1.0 +- 1e-12
    c((0L, 2L)) shouldBe 0.0 +- 1e-12
    c((0L, 3L)) shouldBe -1.0 +- 1e-12
  }

  test("brute-force top-k ranks by cosine with id tie-break") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 3)
      .orderBy("rnk").collect().map(_.getLong(1))
    got shouldBe Array(1L, 2L, 3L)
  }

  test("lsh neighbor pairs recover the parallel pair") {
    val pairs = Similarity.lshNeighborPairs(vecs, minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((0L, 1L))
  }

  test("banded LSH with one band equals the single-signature operator") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val single = Similarity.lshNeighborPairs(corpus, minCosine = 0.2, nPlanes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val banded = Similarity.bandedLshNeighborPairs(corpus, minCosine = 0.2,
        bands = 1, planesPerBand = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    banded shouldBe single
  }

  test("banded LSH emits each pair once and never misses a band-agreeing pair") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    // parallel twins agree in EVERY band (maximal dedup stress) plus
    // random vectors that agree in some band by chance
    val base = (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val twins = base.map { case (i, v) => (i + 1000L, v.map(_ * 3f)) }
    val corpus = (base ++ twins).toDF("vec_id", "embedding")
    val got = Similarity.bandedLshNeighborPairs(corpus, minCosine = 0.5,
        bands = 4, planesPerBand = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got.length shouldBe got.toSet.size // first-band filter dedups exactly
    // every twin pair agrees in all bands and has cosine 1
    (0L until 40L).foreach(i => got should contain((i, i + 1000L)))
  }

  test("cosineDBSCAN composes with the banded LSH graph (full 100 TB shape)") {
    // parallel twins at cosine 1 agree in every band, so the banded
    // graph is lossless for them: clusters of planted dup-groups must
    // match the exact path
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(29)
    val base = (0L until 30L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val twins = base.flatMap { case (i, v) =>
      Seq((i + 100L, v.map(_ * 2f)), (i + 200L, v.map(_ * 3f)))
    }
    val corpus = (base ++ twins).toDF("vec_id", "embedding")
    val exact = Similarity.cosineDBSCAN(corpus, minCos = 0.999, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val banded = Similarity.cosineDBSCAN(corpus, minCos = 0.999, minPts = 3,
        neighborPairs = Some(Similarity.bandedLshNeighborPairs(corpus,
          minCosine = 0.999, bands = 4, planesPerBand = 8)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    banded shouldBe exact
    exact.count(_._3 == "core") shouldBe 90 // every point in a twin-triple
  }

  test("cosineDBSCAN with an injected exact pair graph equals the default path") {
    // 3 parallel groups of 3 + 1 isolated direction: minPts=3 makes the
    // groups clusters and the singleton noise
    val rows = (0 until 3).flatMap { g =>
      val base = Array.tabulate(4)(d => if (d == g) 1.0f else 0.0f)
      (0 until 3).map(i => ((g * 3 + i).toLong, base.map(_ * (i + 1))))
    } :+ (9L, Array(0.0f, 0.0f, 0.0f, 1.0f))
    val corpus = rows.toDF("vec_id", "embedding")
    val exact = Similarity.cosineDBSCAN(corpus, minCos = 0.9, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // the exact graph, expressed as the undirected (id_a, id_b) pair
    // list lshNeighborPairs emits
    val pairGraph = corpus.as("a").join(corpus.as("b"),
        col("a.vec_id") < col("b.vec_id") &&
          Similarity.cosine(col("a.embedding"), col("b.embedding")) >= 0.9)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    val injected = Similarity.cosineDBSCAN(corpus, minCos = 0.9, minPts = 3,
        neighborPairs = Some(pairGraph))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    injected shouldBe exact
    exact.count(_._3 == "noise") shouldBe 1
    exact.filter(_._3 == "core").groupBy(_._2).size shouldBe 3
  }
}

class MultimodalSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary payload decode: sizes, means, blocks") {
    val docs = Seq((7L, "A" * 40)).toDF("doc_id", "text") // 'A' = 65
    val feats = Multimodal.decodeFeatures(spark,
      Multimodal.withBinaryPayload(docs, "text")).collect().head
    feats.doc_id shouldBe 7L
    feats.n_bytes shouldBe 40L
    feats.mean_byte shouldBe 65.0
    feats.n_blocks shouldBe 3 // 16+16+8
    feats.block_means.toSeq shouldBe Seq(65.0, 65.0, 65.0)
  }
}
