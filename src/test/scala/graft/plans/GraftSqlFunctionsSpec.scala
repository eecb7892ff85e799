package graft.plans

import graft.operators.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SQL-registered kernel functions (GraftExtensions.injectFunction) —
  * end-to-end through spark.sql against the same expressions the
  * DataFrame API builds.
  */
class GraftSqlFunctionsSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_cosine / graft_dot / graft_array_dist_sq over a table") {
    Seq(
      (1L, Array(1.0f, 0.0f), Array(2.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f), Array(0.0f, 3.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("vecs")
    val got = spark.sql(
      """SELECT id, graft_cosine(a, b) AS cos, graft_dot(a, b) AS dot,
        |  graft_array_dist_sq(a, b) AS d2 FROM vecs ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    got(0)._2 shouldBe 1.0 +- 1e-12
    got(0)._3 shouldBe 2.0
    got(0)._4 shouldBe 1.0
    got(1)._2 shouldBe 0.0 +- 1e-12
    got(1)._3 shouldBe 0.0
    got(1)._4 shouldBe 10.0
  }

  test("graft_dist_sq and graft_rolling_hash match their Scala kernels") {
    val r = spark.sql(
      "SELECT graft_dist_sq(0.0, 0.0, 3.0, 4.0) AS d, graft_rolling_hash('ab') AS h")
      .head()
    r.getDouble(0) shouldBe 25.0
    r.getLong(1) shouldBe (97L * 31 + 98)
    spark.sql("SELECT graft_rolling_hash('ab', 97)").head().getLong(0) shouldBe
      graft.functions.RollingHash.hash("ab", 97)
  }

  test("graft_simhash32 and graft_hyperplane_bucket match the typed kernels") {
    val texts = Seq("the quick brown fox", "", "alpha beta alpha")
    texts.map(Tuple1(_)).toDF("t").createOrReplaceTempView("docs")
    val got = spark.sql("SELECT graft_simhash32(t) FROM docs").collect().map(_.getLong(0))
    got.toSeq shouldBe texts.map(graft.functions.TextKernels.simhash32)

    Seq(Tuple1(Array.tabulate(8)(i => (i + 1).toFloat))).toDF("v")
      .createOrReplaceTempView("hv")
    val sqlBucket = spark.sql("SELECT graft_hyperplane_bucket(v, 8) FROM hv").head().getLong(0)
    val apiBucket = spark.table("hv")
      .select(graft.operators.Similarity.hyperplaneBucket($"v", 8)).head().getLong(0)
    sqlBucket shouldBe apiBucket
  }

  test("arity and literal-argument errors are caught at analysis") {
    an[Exception] should be thrownBy spark.sql("SELECT graft_dot(array(1.0F))").collect()
    an[Exception] should be thrownBy
      spark.sql("SELECT graft_rolling_hash('x', length('ab'))").collect()
  }
}
