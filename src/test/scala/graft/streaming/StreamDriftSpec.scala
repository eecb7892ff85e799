package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** st28's drift monitor on crafted fixtures: identical halves read
  * tvd = 0 exactly (the integer arithmetic has no noise floor),
  * disjoint halves read tvd = 1, and a planted partial shift lands
  * strictly between — the monitor separates signal from the ~0.04
  * sampling noise the real-corpus oracle run shows.
  */
class StreamDriftSpec extends AnyFunSuite with Matchers {
  lazy val spark = graft.operators.TestSpark.spark
  import spark.implicits._

  /** (user_id, value) rows -> single-file events.parquet fixture. */
  private def writeEvents(rows: Seq[(Long, Double)]): String = {
    val dir = Files.createTempDirectory("drift_").toString
    val stage = s"$dir/_stage"
    rows.zipWithIndex.map { case ((u, v), i) => (i.toLong, u, v) }
      .toDF("event_id", "user_id", "value")
      .select($"event_id", timestamp_seconds($"event_id" * 10).as("ts"),
        $"user_id", lit("click").as("event_type"), $"value",
        lit("{}").as("props"))
      .coalesce(1).write.parquet(stage)
    val part = Files.list(Paths.get(stage)).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(s"$dir/events.parquet"))
    dir
  }

  private def tvd(rows: Seq[(Long, Double)]): Double = {
    val out = Streaming.streamDrift(spark, writeEvents(rows)).collect()
    out.length shouldBe 1 // one event type in the fixture
    out.head.getDouble(4)
  }

  test("identical halves: exactly zero drift (no float noise floor)") {
    // (u/2) decorrelates the bucket from user parity
    val rows = (0L until 400L).map(u => (u, ((u / 2) % 20).toDouble * 25.0 + 1))
    tvd(rows) shouldBe 0.0
  }

  test("disjoint halves: full drift") {
    // even users in buckets 0-3, odd users in buckets 16-19
    val rows = (0L until 400L).map { u =>
      if (u % 2 == 0) (u, (u % 4).toDouble * 25.0 + 1)
      else (u, 400.0 + (u % 4) * 25.0 + 1)
    }
    tvd(rows) shouldBe 1.0
  }

  test("planted partial shift sits between noise and full drift") {
    // odd users: half the mass moved two buckets up
    val rows = (0L until 800L).map { u =>
      val base = ((u / 2) % 8).toDouble
      if (u % 2 == 0) (u, base * 25.0 + 1)
      else (u, (base + (if (u % 4 == 1) 8 else 0)) * 25.0 + 1)
    }
    val d = tvd(rows)
    d should be > 0.3
    d should be < 0.9
  }
}
