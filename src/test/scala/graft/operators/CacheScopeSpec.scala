package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The operator-cache lifecycle contract: composing the persisting
  * dedup operators under one CacheScope and releasing it leaves ZERO
  * residual cached RDDs — a long-lived session composing operators no
  * longer accumulates storage memory until eviction churn. Asserted on
  * the DELTA of persistent-RDD ids so concurrently-running suites
  * can't flake the check. Also: results must be unaffected by release
  * (a re-action recomputes from source).
  */
class CacheScopeSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ")
    val rnd = new scala.util.Random(5)
    (0 until 80).map { i =>
      (i.toLong, Seq.fill(15)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("composing d02+d04+d06 operators under a scope releases every cache") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val scope = new CacheScope
    val d = docs
    // the three operator shapes behind d02 / d04 / d06
    val jac = Dedup.jaccardPairs(d, "text", "doc_id", 3, 0.3, scope)
    val lsh = Dedup.lshCandidatePairs(d, "text", "doc_id", 16, 4, 3, scope)
    val sim = Dedup.simhashNearPairs(d, "text", "doc_id", 3, scope)
    val counts = (jac.count(), lsh.count(), sim.count())
    val during = sc.getPersistentRDDs.keySet -- before
    during should not be empty // the caches actually engaged
    scope.release()
    val after = sc.getPersistentRDDs.keySet -- before
    after shouldBe empty
    // released results stay correct: re-running the actions recomputes
    (jac.count(), lsh.count(), sim.count()) shouldBe counts
    // release is idempotent
    noException should be thrownBy scope.release()
  }

  test("chunkOverlapPairs (m05) caches under the scope and releases clean") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val scope = new CacheScope
    val pairs = Multimodal.chunkOverlapPairs(docs, "text", "doc_id",
      dfCap = 50, minOverlap = 0.1, scope = scope)
    val n = pairs.count()
    (sc.getPersistentRDDs.keySet -- before) should not be empty
    scope.release()
    (sc.getPersistentRDDs.keySet -- before) shouldBe empty
    pairs.count() shouldBe n
  }

  test("in situ: the registered t17 pipeline under a managed scope releases clean") {
    // the REAL registered query's pipeline (not a synthetic compose):
    // run it end-to-end with a managed scope, assert the zero-residual
    // contract holds on a query the driver actually grades
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit}
    val sc = spark.sparkContext
    val docs0 = docs.withColumn("lang", lit("en"))
      .withColumn("text", concat($"text",
        lit(" " + Seq.fill(45)("the word of and to in play").mkString(" "))))
    val before = sc.getPersistentRDDs.keySet
    val scope = new CacheScope
    val out = graft.queries.NorthStar.curationPipeline(docs0, scope)
    val n = out.count()
    (sc.getPersistentRDDs.keySet -- before) should not be empty // the persist engaged
    scope.release()
    (sc.getPersistentRDDs.keySet -- before) shouldBe empty
    out.count() shouldBe n // released result recomputes identically
  }

  test("default scope is session-managed: releaseSession reclaims all") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // no scope passed — the default CacheScope.session tracks these in
    // the per-session registry
    val lsh = Dedup.lshCandidatePairs(docs, "text", "doc_id")
    val n = lsh.count()
    val during = sc.getPersistentRDDs.keySet -- before
    during should not be empty
    CacheScope.unmanaged.release() // no-op: tracked nothing
    (sc.getPersistentRDDs.keySet -- before) shouldBe during
    CacheScope.releaseSession(spark)
    (sc.getPersistentRDDs.keySet -- before) shouldBe empty
    lsh.count() shouldBe n // released result recomputes identically
    CacheScope.releaseSession(spark) // idempotent
  }
}
