package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Drives the REGISTERED st26 path (Sources.eventsStream sniffing a
  * real single-file parquet fixture with TimestampType micros — the
  * encoding that regressed in r8/r9) against hand-computed and
  * brute-force anomaly verdicts.
  */
class GapAnomalySpec extends AnyFunSuite with Matchers {
  lazy val spark = graft.operators.TestSpark.spark
  import spark.implicits._

  /** Write (event_id, user_id, sec) rows as a SINGLE FILE
    * `<dir>/events.parquet` with the full events schema and a
    * TimestampType ts — the physical layout Sources sniffs.
    */
  private def writeEvents(rows: Seq[(Long, Long, Long)]): String = {
    val dir = Files.createTempDirectory("gap_anomaly_").toString
    val stage = s"$dir/_stage"
    rows.toDF("event_id", "user_id", "sec")
      .select($"event_id", timestamp_seconds($"sec").as("ts"), $"user_id",
        lit("click").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .coalesce(1).write.parquet(stage)
    val part = Files.list(Paths.get(stage)).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(s"$dir/events.parquet"))
    dir
  }

  /** Independent straight-line reimplementation of the verdict over
    * per-user event seconds (sorted by (sec, id)).
    */
  private def brute(rows: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] =
    rows.groupBy(_._2).map { case (uid, evs) =>
      val secs = evs.sortBy(e => (e._3, e._1)).map(_._3)
      var (n, s, q, anom) = (0L, BigInt(0), BigInt(0), 0L)
      secs.sliding(2).filter(_.size == 2).foreach { case Seq(a, b) =>
        val g = BigInt(b - a)
        val lhs = g * n - s
        if (n >= 8 && lhs * lhs > (n * q - s * s) * 9) anom += 1
        n += 1; s += g; q += g * g
      }
      uid -> (n, anom)
    }.filter(_._2._1 >= 1)

  private def run(rows: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] =
    Streaming.streamGapAnomaly(spark, writeEvents(rows))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("constant cadence then a burst: exactly the burst gap flags") {
    // user 1: 10 events 10s apart (9 gaps, sigma 0), then a 1000s gap
    val u1 = (0 to 9).map(i => (i.toLong, 1L, i * 10L)) :+ (10L, 1L, 1090L)
    // user 2: only one event -> no gap history, excluded from output
    val rows = u1 :+ (99L, 2L, 50L)
    run(rows) shouldBe Map(1L -> (10L, 1L))
  }

  test("alternating gaps stay inside 3 sigma; an outlier flags") {
    // gaps 5,15,5,15,... mean 10, sigma 5 -> |15-10| < 3 sigma, quiet
    var t = 0L
    val quiet = (0 to 12).map { i =>
      t += (if (i % 2 == 0) 5L else 15L); (i.toLong, 7L, t)
    }
    run((0L, 7L, 0L) +: quiet) shouldBe Map(7L -> (13L, 0L))
    // same cadence plus a 100s gap at the end: one anomaly
    val burst = ((0L, 7L, 0L) +: quiet) :+ (90L, 7L, t + 100L)
    run(burst) shouldBe Map(7L -> (14L, 1L))
  }

  test("matches the brute-force verdicts on pseudo-random multi-user data") {
    val rnd = new scala.util.Random(11)
    var id = 0L
    val rows = (1L to 6L).flatMap { uid =>
      var t = rnd.nextInt(100).toLong
      (1 to 40).map { _ =>
        t += (rnd.nextInt(30) + 1).toLong
        if (rnd.nextInt(12) == 0) t += 500L // occasional burst
        id += 1; (id, uid, t)
      }
    }
    val got = run(rows)
    got shouldBe brute(rows)
    got.values.map(_._2).sum should be > 0L // the bursts actually flag
  }
}
