package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** m17/st57's distribution contract, pinned against an INDEPENDENT
  * per-shot count (not the oracle — the m17 least/greatest-null bug
  * was hash-green on BOTH sides because engine and oracle shared the
  * same spelling; this spec is the independently-spelled witness).
  */
class SpeechCoverageSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batchRows = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Multimodal.speechShotCoverage(spark,
        Multimodal.withBinaryPayload(docs.select($"doc_id", $"text"), "text"),
        vadThr = 95, cutThr = 96L)
      .select($"doc_id", $"shot", $"start_f", $"end_f", $"shot_blocks",
        $"speech_blocks", $"speech_frac", $"is_silent")
      .as[(Long, Long, Long, Long, Long, Long, Double, Boolean)]
      .collect()
  }

  test("coverage rows match an independent per-block count (no null-fold trap)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // independent spelling: zip activity with a running shot counter
    // per doc, count active blocks per shot — no join, no span tables
    val truth = Multimodal.withBinaryPayload(
        docs.select($"doc_id", $"text"), "text")
      .select($"doc_id".cast("long"), $"payload")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val blocks = payload.grouped(Multimodal.StubCodec.BlockSize)
          .map { blk =>
            var s = 0L; var j = 0
            while (j < blk.length) { s += blk(j) & 0xff; j += 1 }
            (s, blk.length)
          }.toArray
        var shot = 0L; var prev = -1L
        blocks.map { case (s, len) =>
          if (prev >= 0 && math.abs(s - prev) > 96L) shot += 1
          prev = s
          (id, shot, if (s >= 95L * len) 1L else 0L)
        }
      }
      .toDF("doc_id", "shot", "active")
      .groupBy($"doc_id", $"shot")
      .agg(sum($"active").as("speech"), count(lit(1)).as("len"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (d, sh, sp, len) => (d, sh) -> ((sp, len)) }.toMap
    val got = batchRows
    got.length shouldBe truth.size
    got.foreach { case (d, sh, _, _, len, speech, frac, silent) =>
      val (tSpeech, tLen) = truth((d, sh))
      speech shouldBe tSpeech
      len shouldBe tLen
      silent shouldBe (tSpeech == 0L)
      frac shouldBe BigDecimal(tSpeech.toDouble / tLen)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // the fixture genuinely exercises both branches of the gate
    got.count(_._8) should be > 0
    got.count(!_._8) should be > 0
  }
}
