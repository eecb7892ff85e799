package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bounded-state contract behind st11/st12, asserted on a
  * CONTROLLED multi-batch replay (MemoryStream — the file replay the
  * registered queries use delivers one batch, which exercises the
  * semantics but not the eviction). Each test advances the watermark
  * across batches and asserts, from the query's own progress metrics,
  * that state rows are EVICTED — the store holds the recent horizon,
  * not every key ever seen.
  */
class StreamingBoundedStateSpec extends AnyFunSuite with Matchers {
  lazy val spark = graft.operators.TestSpark.spark

  private def ts(hours: Double): Timestamp = new Timestamp((hours * 3600 * 1000).toLong)

  /** Run `batches` through the streaming transform one trigger each;
    * returns (collected output rows, state rows after the last batch).
    */
  private def drive[A: org.apache.spark.sql.Encoder](
      batches: Seq[Seq[A]],
      transform: org.apache.spark.sql.Dataset[A] => org.apache.spark.sql.DataFrame)
      : (Array[org.apache.spark.sql.Row], Long) = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val src = MemoryStream[A]
      val name = s"graft_bounded_${System.nanoTime()}"
      val q = transform(src.toDS()).writeStream
        .outputMode("update").format("memory").queryName(name).start()
      try {
        batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
        // one empty commit so evictions from the LAST data batch's
        // watermark advance are applied and visible in the metrics
        src.addData(); q.processAllAvailable()
        val stateRows = Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        (spark.table(name).collect(), stateRows)
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("dropDuplicatesWithinWatermark evicts expired keys (st11 contract)") {
    import spark.implicits._
    // 6 distinct keys across 3 hours-apart batches, 1h delay: by the
    // final batch the watermark has passed the early keys' horizon
    val batches = Seq(
      Seq(("a", ts(0.0)), ("b", ts(0.2)), ("a", ts(0.3))), // dup "a" collapses
      Seq(("c", ts(10.0)), ("d", ts(10.1))),               // watermark -> ~9h: a,b evictable
      Seq(("e", ts(20.0)), ("f", ts(20.1))))               // watermark -> ~19h: c,d evictable
    val (rows, stateRows) = drive[(String, Timestamp)](batches, ds =>
      ds.toDF("k", "event_time")
        .withWatermark("event_time", "1 hour")
        .dropDuplicatesWithinWatermark("k")
        .select(col("k")))
    // output: each distinct key once (no key recurs after its eviction)
    rows.map(_.getString(0)).sorted shouldBe Array("a", "b", "c", "d", "e", "f")
    // the bounded-state point: far fewer state rows than keys ever seen
    stateRows should be >= 0L
    stateRows should be < 6L
    // plain dropDuplicates on the same replay retains ALL 6 keys
    val (_, unboundedState) = drive[(String, Timestamp)](batches, ds =>
      ds.toDF("k", "event_time").dropDuplicates("k").select(col("k")))
    unboundedState shouldBe 6L
  }

  test("EventTimeTimeout evicts idle users and emits their final state (st12 contract)") {
    import spark.implicits._
    val ttlHours = 2
    def transform(ds: org.apache.spark.sql.Dataset[(Long, Double, Timestamp)]) =
      ds.toDF("user_id", "value", "event_time")
        .withWatermark("event_time", "1 hour")
        .as[(Long, Double, Timestamp)]
        .groupByKey(_._1)
        .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout) {
          (uid: Long, rows: Iterator[(Long, Double, Timestamp)],
           state: org.apache.spark.sql.streaming.GroupState[UserState]) =>
            if (state.hasTimedOut) {
              val last = state.get; state.remove(); last
            } else {
              val prev = state.getOption.getOrElse(UserState(uid, Double.NegativeInfinity, 0L))
              var maxMs = Long.MinValue
              val next = rows.foldLeft(prev) { (acc, e) =>
                if (e._3.getTime > maxMs) maxMs = e._3.getTime
                UserState(uid, math.max(acc.max_value, e._2), acc.n_events + 1)
              }
              state.update(next)
              state.setTimeoutTimestamp(maxMs + ttlHours * 3600L * 1000L)
              next
            }
        }.toDF()
    // times start at hour 1, not 0: an event at exactly the initial
    // watermark (epoch 0) is filtered as late before reaching the state
    val batches = Seq(
      Seq((1L, 5.0, ts(1.0)), (2L, 7.0, ts(1.1)), (1L, 9.0, ts(1.2))),
      Seq((3L, 4.0, ts(11.0))),  // watermark -> 10h: users 1,2 past TTL
      Seq((4L, 6.0, ts(21.0)))) // their timeout fires in this batch
    val (rows, stateRows) = drive[(Long, Double, Timestamp)](batches, transform)
    val byUser = rows.map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._2)).toMap
    // evicted users' final state was emitted before removal
    byUser(1L) shouldBe ((9.0, 2L))
    byUser(2L) shouldBe ((7.0, 1L))
    // state holds only users inside the TTL horizon, not all 4 ever seen
    stateRows should be >= 0L
    stateRows should be < 4L
  }
}
