package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** st31 (funnel) and st32 (decay) state machines driven through
  * CONTROLLED multi-batch MemoryStream replays — the session-close /
  * cell-eviction transitions that the registered single-batch file
  * replay cannot exercise. Both transforms assume time-ordered arrival
  * across batches (the file/kafka contract), so batches are time-order
  * chunks; within a batch order is free (they sort).
  */
class StreamFunnelDecaySpec extends AnyFunSuite with Matchers {
  lazy val spark = graft.operators.TestSpark.spark

  // ---------- brute-force oracles (q40 / q58 semantics, in Scala) ----------

  private def bruteFunnel(rows: Seq[FunEvent]): (Long, Long, Long, Long) = {
    var (ns, nv, nc, np) = (0L, 0L, 0L, 0L)
    rows.groupBy(_.user_id).values.foreach { es =>
      val sorted = es.toSeq.sortBy(e => (e.s, e.event_id))
      val sessions = sorted.foldLeft(List.empty[List[FunEvent]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) =>
          if (e.s - cur.head.s > 1800) List(e) :: cur :: done
          else (e :: cur) :: done
      } // each session list is reverse-ordered; head = latest
      sessions.foreach { sess =>
        val mv = sess.filter(_.event_type == "view").map(_.s).minOption
        val mc = mv.flatMap(v =>
          sess.filter(e => e.event_type == "click" && e.s >= v).map(_.s).minOption)
        val mp = mc.flatMap(c =>
          sess.filter(e => e.event_type == "purchase" && e.s >= c).map(_.s).minOption)
        ns += 1
        if (mv.isDefined) nv += 1
        if (mc.isDefined) nc += 1
        if (mp.isDefined) np += 1
      }
    }
    (ns, nv, nc, np)
  }

  private def bruteDecay(rows: Seq[DecayEvent]): Map[Long, (Long, Long, Long)] = {
    val rh = rows.map(_.h).max
    rows.groupBy(_.user_id).map { case (u, es) =>
      val recent = es.filter(e => rh - e.h <= 30)
      val score = recent.map(e => e.w * (1L << (30 - (rh - e.h)).toInt)).sum
      u -> (score, recent.size.toLong, es.size.toLong)
    }
  }

  // ---------- drivers ----------

  private def driveFunnel(batches: Seq[Seq[FunEvent]]): (Long, Long, Long, Long) = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[FunEvent]
      val name = s"graft_fun_${System.nanoTime()}"
      val q = Streaming.funnelTransform(src.toDS()).toDF().writeStream
        .outputMode("update").format("memory").queryName(name).start()
      try {
        batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
        val latest = spark.table(name).collect()
          .groupBy(_.getLong(0)).values
          .map(rs => (rs.map(_.getLong(1)).max, rs.map(_.getLong(2)).max,
            rs.map(_.getLong(3)).max, rs.map(_.getLong(4)).max))
        latest.foldLeft((0L, 0L, 0L, 0L)) { case ((a, b, c, d), (w, x, y, z)) =>
          (a + w, b + x, c + y, d + z)
        }
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Returns (readout rows keyed by user, max cells any state kept). */
  private def driveDecay(batches: Seq[Seq[DecayEvent]])
      : (Map[Long, (Long, Long, Long)], Int) = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[DecayEvent]
      val name = s"graft_dec_${System.nanoTime()}"
      val q = Streaming.decayTransform(src.toDS()).toDF().writeStream
        .outputMode("update").format("memory").queryName(name).start()
      try {
        batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
        val states = spark.table(name)
        val maxCells = states.collect().map(_.getSeq[Long](2).size).max
        val out = Streaming.decayReadout(states).collect().map { r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))
        }.toMap
        (out, maxCells)
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  // ---------- funnel ----------

  test("funnel tie semantics: same-second click/purchase scanned before the view still qualify") {
    val rows = Seq(
      // u1: click and purchase in mv's exact second, ids BEFORE the view
      FunEvent(1, "click", 100, 1), FunEvent(1, "purchase", 100, 2),
      FunEvent(1, "view", 100, 3),
      // u2: purchase strictly before the view's second — must NOT qualify
      FunEvent(2, "purchase", 50, 1), FunEvent(2, "view", 100, 2),
      FunEvent(2, "click", 150, 3),
      // u3: full ordered funnel
      FunEvent(3, "view", 10, 1), FunEvent(3, "click", 20, 2),
      FunEvent(3, "purchase", 30, 3))
    val got = driveFunnel(Seq(rows))
    got shouldBe bruteFunnel(rows)
    got shouldBe ((3L, 3L, 3L, 2L)) // u2's early purchase filtered
  }

  test("funnel sessions split across micro-batch boundaries") {
    val rows = Seq(
      FunEvent(7, "view", 1000, 1), FunEvent(7, "click", 1100, 2),
      // batch boundary falls here; gap > 1800 => new session
      FunEvent(7, "purchase", 4000, 3), // no view/click in THIS session
      FunEvent(7, "view", 4100, 4), FunEvent(7, "purchase", 4200, 5))
    val expect = bruteFunnel(rows) // 2 sessions; funnel depth view+click / view
    driveFunnel(Seq(rows.take(2), rows.drop(2))) shouldBe expect
    driveFunnel(rows.map(Seq(_))) shouldBe expect // one event per batch
  }

  test("funnel fuzz: any time-ordered batch split matches the batch q40 semantics") {
    val rnd = new scala.util.Random(11)
    val types = Array("view", "click", "purchase", "error", "signup")
    val rows = (1 to 600).map { i =>
      FunEvent(rnd.nextInt(12).toLong, types(rnd.nextInt(types.length)),
        rnd.nextInt(20000).toLong, i.toLong)
    }.sortBy(e => (e.s, e.event_id))
    val expect = bruteFunnel(rows)
    driveFunnel(Seq(rows)) shouldBe expect
    driveFunnel(rows.grouped(73).toSeq) shouldBe expect
    driveFunnel(rows.grouped(211).toSeq) shouldBe expect
  }

  // ---------- decay ----------

  test("decay: multi-batch replay matches the batch q58 formula exactly") {
    val rnd = new scala.util.Random(23)
    val ws = Array(16L, 4L, 2L, 0L, 1L)
    val rows = (1 to 500).map { _ =>
      DecayEvent(rnd.nextInt(10).toLong, (470000 + rnd.nextInt(80)).toLong,
        ws(rnd.nextInt(ws.length)))
    }.sortBy(_.h)
    val expect = bruteDecay(rows)
    driveDecay(Seq(rows))._1 shouldBe expect
    driveDecay(rows.grouped(97).toSeq)._1 shouldBe expect
  }

  // ---------- attribution (st33) ----------

  test("attribution carries the last touch across micro-batch boundaries") {
    val rows = Seq(
      AttrEvent(1, "view", 10, 1, 5.0),
      AttrEvent(1, "purchase", 20, 2, 7.0),  // -> view
      // batch boundary; nothing between the purchases
      AttrEvent(1, "purchase", 30, 3, 9.0),  // -> still view (LOCF)
      AttrEvent(2, "purchase", 5, 1, 1.0),   // first-ever -> none
      AttrEvent(2, "click", 6, 2, 2.0),
      AttrEvent(2, "purchase", 7, 3, 3.0))   // -> click
    def brute(rs: Seq[AttrEvent]): Map[String, (Long, Double)] =
      rs.groupBy(_.user_id).values.flatMap { es =>
        val sorted = es.toSeq.sortBy(e => (e.s, e.event_id))
        sorted.zipWithIndex.collect { case (e, i) if e.event_type == "purchase" =>
          val attr = sorted.take(i).reverse
            .find(_.event_type != "purchase").map(_.event_type).getOrElse("none")
          (attr, e.value)
        }
      }.toSeq.groupBy(_._1)
        .map { case (k, vs) => k -> (vs.size.toLong, vs.map(_._2).sum) }
    val expect = brute(rows)
    def drive(batches: Seq[Seq[AttrEvent]]): Map[String, (Long, Double)] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        import spark.implicits._
        val src = MemoryStream[AttrEvent]
        val name = s"graft_attr_${System.nanoTime()}"
        val q = Streaming.attributionTransform(src.toDS()).toDF().writeStream
          .outputMode("append").format("memory").queryName(name).start()
        try {
          batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
          spark.table(name).collect()
            .groupBy(_.getString(0))
            .map { case (k, rs) =>
              k -> (rs.length.toLong, rs.map(_.getDouble(1)).sum)
            }
        } finally q.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    drive(Seq(rows)) shouldBe expect
    drive(Seq(rows.take(2), rows.slice(2, 4), rows.drop(4))) shouldBe expect
    drive(rows.map(Seq(_))) shouldBe expect
  }

  test("decay state is a bounded ring: old hour cells evict, score unchanged") {
    // one user active every hour for 200 hours: state must stay <= 31 cells
    val rows = (0 until 200).map(i => DecayEvent(1, 1000L + i, 2L))
    val (out, maxCells) = driveDecay(rows.grouped(20).toSeq)
    maxCells should be <= 31
    out shouldBe bruteDecay(rows)
    // closed form: sum over ages 0..30 of 2 * 2^(30-age)
    out(1L)._1 shouldBe (0 to 30).map(a => 2L * (1L << (30 - a))).sum
    out(1L)._2 shouldBe 31L
    out(1L)._3 shouldBe 200L
  }
}
