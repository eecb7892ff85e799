package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Red-path coverage for the signature-index width guard: a
  * caller-supplied index with the wrong k — or a MIXED-width
  * (corrupted) one — must be rejected at planning time, because the
  * probe itself would not fail on it (null band sigs + zip_with
  * truncation silently skew est_sim instead).
  */
class SignatureIndexGuardSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    Seq((1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "one two three four five six seven")).toDF("doc_id", "text")
  }

  private def index(widths: Seq[Int]) = {
    import spark.implicits._
    widths.zipWithIndex.map { case (w, i) =>
      (100L + i, (0 until w).map(_.toLong))
    }.toDF("id", "minhashes")
  }

  test("wrong-k index is rejected with the width in the message") {
    val ex = intercept[IllegalArgumentException] {
      Dedup.probeVerdicts(docs, "text", "doc_id", index(Seq(8, 8)), k = 16)
    }
    ex.getMessage should include("width 8")
    ex.getMessage should include("k=16")
  }

  test("mixed-width (corrupted) index is rejected even when one row matches k") {
    // the old first-row-only peek passed this: row 0 has width 16
    val ex = intercept[IllegalArgumentException] {
      Dedup.probeVerdicts(docs, "text", "doc_id", index(Seq(16, 8, 16)), k = 16)
    }
    ex.getMessage should include("mixed-width")
    ex.getMessage should include("8..16")
  }

  test("matching-width index passes and probes") {
    val real = Dedup.minhashes(docs.limit(1), "text", "doc_id", k = 16, n = 3)
      .select(col("id"), col("minhashes"))
    val out = Dedup.probeVerdicts(docs, "text", "doc_id", real, k = 16)
    out.columns.toSeq shouldBe Seq("doc_id", "canonical_id", "is_new")
    out.count() shouldBe 2
  }

  test("empty index passes; every probe row is new") {
    val empty = index(Seq.empty).limit(0)
    val out = Dedup.probeVerdicts(docs, "text", "doc_id", empty, k = 16).collect()
    out.length shouldBe 2
    out.forall(_.getAs[Boolean]("is_new")) shouldBe true
  }
}
