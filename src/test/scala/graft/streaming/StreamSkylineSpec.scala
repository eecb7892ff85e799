package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** st27's frontier maintenance driven through CONTROLLED multi-batch
  * MemoryStream replays: the final frontier must equal the batch
  * skyline of everything seen, for ANY batch split and arrival order
  * (the order-independence the registered single-batch replay can't
  * exercise), and the kept state must be the frontier, not the stream.
  */
class StreamSkylineSpec extends AnyFunSuite with Matchers {
  lazy val spark = graft.operators.TestSpark.spark

  private def brute(rows: Seq[SkyEvent]): Set[(String, Double, Long)] =
    rows.filter { r =>
      !rows.exists(s => s.event_type == r.event_type &&
        s.value >= r.value && s.sec <= r.sec &&
        (s.value > r.value || s.sec < r.sec))
    }.map(e => (e.event_type, e.value, e.sec)).toSet

  /** Drive batches through the real transform; return final frontier
    * per key (latest emission by n_seen) and its max frontier size.
    */
  private def drive(batches: Seq[Seq[SkyEvent]]): (Set[(String, Double, Long)], Int) = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[SkyEvent]
      val name = s"graft_sky_${System.nanoTime()}"
      val q = Streaming.skylineTransform(src.toDS()).toDF().writeStream
        .outputMode("update").format("memory").queryName(name).start()
      try {
        batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
        val rows = spark.table(name).collect()
        val latest = rows.groupBy(_.getString(0)).map { case (_, rs) =>
          rs.maxBy(_.getLong(1))
        }
        val frontier = latest.flatMap { r =>
          val vs = r.getSeq[Double](2); val ss = r.getSeq[Long](3)
          vs.zip(ss).map { case (v, t) => (r.getString(0), v, t) }
        }.toSet
        (frontier, latest.map(r => r.getSeq[Double](2).size).max)
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("final frontier equals the batch skyline under any batch split and order") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 120).map { i =>
      SkyEvent(if (i % 2 == 0) "click" else "view",
        (rnd.nextInt(30) * 10).toDouble, rnd.nextInt(40).toLong)
    }
    val expect = brute(rows)
    drive(Seq(rows))._1 shouldBe expect                       // one batch
    drive(rows.grouped(17).toSeq)._1 shouldBe expect          // many batches
    drive(rnd.shuffle(rows).grouped(40).toSeq)._1 shouldBe expect // reordered
  }

  test("state holds the frontier, not the stream: dominated points are evicted") {
    // a rising staircase: each point dominates all earlier ones
    val rows = (1 to 50).map(i => SkyEvent("a", i * 1.0, 100L - i))
    val (frontier, maxKept) = drive(rows.grouped(10).toSeq)
    frontier shouldBe Set(("a", 50.0, 50L))
    maxKept shouldBe 1 // 50 points seen, ONE kept
  }

  test("duplicates of an undominated point all survive across batches") {
    val rows = Seq(SkyEvent("a", 5.0, 5L), SkyEvent("a", 5.0, 5L),
      SkyEvent("a", 4.0, 9L))
    val (frontier, _) = drive(rows.map(Seq(_)))
    // set-level: the dup collapses in a Set; row-level via brute parity
    frontier shouldBe brute(rows)
    drive(Seq(rows))._2 shouldBe 2 // both copies kept in state
  }
}
