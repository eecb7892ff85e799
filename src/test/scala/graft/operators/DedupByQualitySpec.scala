package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => arraySize}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Quality-argmax canonical rule: the kept member of a near-dup
  * component is the quality maximum even when it has the LARGER id —
  * the case the min-id rule of dedupVerdicts gets wrong (keeping the
  * truncated copy because it arrived first / sorted lower).
  */
class DedupByQualitySpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def quality = arraySize(array_distinct(TextAnalysis.tokens(col("text")))).cast("long")

  /** Corpus where the TRUNCATED copy has the small id and the full
    * original sits at id+100000 — reversed mutCorpus.
    */
  private def reversedCorpus() = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 50)
    val toks = TextAnalysis.tokens($"text")
    docs.select($"doc_id",
        array_join(slice(toks, lit(1),
          greatest(floor(arraySize(toks) * 0.6).cast("int"), lit(1))), " ").as("text"))
      .unionByName(docs.select(($"doc_id" + 100000).as("doc_id"), $"text"))
  }

  test("kept member is the quality argmax, not the min id") {
    val out = Dedup.dedupVerdictsByQuality(reversedCorpus(), "text", "doc_id",
      quality, k = 16, bands = 4, n = 3, minEstSim = 0.3).collect()
    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // the kept member of every component is its (quality, -id) argmax
    val byComp = byId.toSeq.groupBy(_._2._1)
    byComp.foreach { case (canon, members) =>
      val expected = members.maxBy { case (id, (_, q, _, _)) => (q, -id) }._1
      members.foreach { case (id, (_, _, keptId, isKept)) =>
        withClue(s"component $canon member $id:") {
          keptId shouldBe expected
          isKept shouldBe (id == expected)
        }
      }
      // canonical_id stays the stable min-id component label
      canon shouldBe members.map(_._1).min
    }
    // and the rule actually differs from min-id: the full originals
    // (+100000, more distinct tokens) win over their truncated copies
    val nonMinKept = byComp.filter { case (canon, members) =>
      members.size > 1 && members.exists { case (id, (_, _, k, _)) => k != canon }
    }
    nonMinKept should not be empty
  }

  test("singletons keep themselves with their own quality") {
    val solo = Seq((7L, "completely unique words that match nothing else"),
        (9L, "another entirely disjoint vocabulary set here"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupVerdictsByQuality(solo, "text", "doc_id", quality)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getBoolean(4)))).toMap
    out(7L) shouldBe ((7L, 7L, true))
    out(9L) shouldBe ((9L, 9L, true))
  }
}
