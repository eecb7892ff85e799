package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** st39's chain-suppression state machine driven through controlled
  * multi-batch MemoryStream replays: the state (last KEPT second)
  * must carry across batch boundaries so a sub-gap drizzle split over
  * batches keeps exactly the same events as a single-batch replay.
  * Time-ordered arrival across batches (the file/kafka contract);
  * within a batch order is free (the transform sorts).
  */
class StreamThrottleSpec extends AnyFunSuite with Matchers {
  lazy val spark = graft.operators.TestSpark.spark

  /** Brute-force chain suppression, the st39 oracle's semantics. */
  private def brute(rows: Seq[ThrottleEvent], gapS: Long)
      : Map[(Long, String), (Long, Long)] =
    rows.groupBy(e => (e.user_id, e.event_type)).map { case (k, es) =>
      val sorted = es.sortBy(e => (e.s, e.event_id))
      var lastKept = Long.MinValue; var kept = 0L
      sorted.foreach { e =>
        if (lastKept == Long.MinValue || e.s - lastKept >= gapS) {
          lastKept = e.s; kept += 1
        }
      }
      k -> (es.size.toLong, kept)
    }

  private def drive(batches: Seq[Seq[ThrottleEvent]], gapS: Long)
      : Map[(Long, String), (Long, Long)] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[ThrottleEvent]
      val name = s"graft_thr_${System.nanoTime()}"
      val q = Streaming.throttleTransform(src.toDS(), gapS).toDF().writeStream
        .outputMode("update").format("memory").queryName(name).start()
      try {
        batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .groupBy(r => (r.getLong(0), r.getString(1)))
          .view.mapValues(rs =>
            (rs.map(_.getLong(3)).max, rs.map(_.getLong(4)).max))
          .toMap
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sub-gap drizzle re-emits every gapS; state survives batch splits") {
    // u1/a: 0, 200, 400, 500, 700 with gap 300 →
    // keep 0 (last=0), drop 200, keep 400 (last=400), drop 500, keep 700
    val rows = Seq(
      ThrottleEvent(1, "a", 0, 1), ThrottleEvent(1, "a", 200, 2),
      ThrottleEvent(1, "a", 400, 3), ThrottleEvent(1, "a", 500, 4),
      ThrottleEvent(1, "a", 700, 5),
      // u2/b: exactly-at-gap boundary kept (>=)
      ThrottleEvent(2, "b", 0, 1), ThrottleEvent(2, "b", 300, 2),
      // u1/b independent of u1/a
      ThrottleEvent(1, "b", 0, 1), ThrottleEvent(1, "b", 100, 2))
    val expect = brute(rows, 300L)
    expect((1L, "a")) shouldBe ((5L, 3L))
    expect((2L, "b")) shouldBe ((2L, 2L))
    expect((1L, "b")) shouldBe ((2L, 1L))
    // one batch
    drive(Seq(rows), 300L) shouldBe expect
    // time-ordered splits: every split point must give the same answer
    val ordered = rows.sortBy(e => (e.s, e.user_id, e.event_id))
    for (cut <- Seq(2, 4, 7)) {
      drive(Seq(ordered.take(cut), ordered.drop(cut)), 300L) shouldBe expect
    }
  }

  test("debounce (q71 lag rule) and throttle genuinely differ on a drizzle") {
    // 0, 200, 400: debounce keeps only the first (each raw gap 200 <= 300);
    // throttle re-emits at 400 (>= 300 since last KEPT)
    val rows = Seq(ThrottleEvent(7, "x", 0, 1),
      ThrottleEvent(7, "x", 200, 2), ThrottleEvent(7, "x", 400, 3))
    val debounceKept = { // q71's rule: gap from previous RAW event
      val sorted = rows.sortBy(e => (e.s, e.event_id))
      1L + sorted.sliding(2).count {
        case Seq(a, b) => b.s - a.s > 300
        case _ => false
      }
    }
    debounceKept shouldBe 1L
    brute(rows, 300L)((7L, "x"))._2 shouldBe 2L
    drive(Seq(rows), 300L)((7L, "x"))._2 shouldBe 2L
  }
}
