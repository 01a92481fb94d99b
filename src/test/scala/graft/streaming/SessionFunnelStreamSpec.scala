package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.streaming.SessionFunnelStream.{SessionLevel, SfEv}

class SessionFunnelStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  private def run(evs: Seq[SfEv], chunks: Int): Seq[SessionLevel] = {
    val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
    val per = math.max(1, sorted.size / chunks)
    runBatches(sorted.grouped(per).toSeq)
  }

  /** Feed explicit batches (arrival order ≠ time order allowed). */
  private def runBatches(batches: Seq[Seq[SfEv]]): Seq[SessionLevel] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[SfEv]
    val q = SessionFunnelStream.levels(
        in.toDF().withColumnRenamed("ts", "ts"))
      .writeStream.format("memory").queryName("sf_levels")
      .outputMode("append").start()
    try {
      batches.foreach { g => in.addData(g: _*); q.processAllAvailable() }
      val maxT = batches.flatten.map(_.ts.getTime).max
      // three far-future sentinels: advance the watermark past end+gap
      // and fire the close timeouts armed when those batches complete
      (1 to 3).foreach { i =>
        in.addData(SfEv(-1, ts(maxT + i * 7_200_000L), -i, "click"))
        q.processAllAvailable()
      }
      spark.table("sf_levels").as[SessionLevel].collect().toSeq
        .filter(_.user_id >= 0)
    } finally { q.stop(); spark.catalog.dropTempView("sf_levels") }
  }

  /** Batch replica: global (t, id) sort per user, gap fold, cvp probe. */
  private def expected(evs: Seq[SfEv]): Seq[SessionLevel] =
    evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      val sessions = sorted.foldLeft(Vector.empty[Vector[SfEv]]) { (acc, e) =>
        if (acc.nonEmpty &&
            e.ts.getTime - acc.last.last.ts.getTime <= SessionFunnelStream.GapMs)
          acc.init :+ (acc.last :+ e)
        else acc :+ Vector(e)
      }
      sessions.map { ses =>
        val seq = ses.map(e => e.event_type match {
          case "click" => "c"; case "view" => "v"; case _ => "p"
        }).mkString
        val lvl = if (seq.contains("cvp")) 3L else if (seq.contains("cv")) 2L
          else if (seq.contains("c")) 1L else 0L
        SessionLevel(u, ses.head.ts.getTime, ses.last.ts.getTime,
          ses.size.toLong, lvl)
      }
    }

  test("unit scenario: levels, gap splits, timeout close") {
    val base = 1_700_000_000_000L
    val G = SessionFunnelStream.GapMs
    val evs = Seq(
      SfEv(1, ts(base), 1, "click"), SfEv(1, ts(base + 60_000), 2, "view"),
      SfEv(1, ts(base + 120_000), 3, "purchase"),        // session 1 → level 3
      SfEv(1, ts(base + 120_000 + G + 1), 4, "view"),    // session 2 → level 0
      SfEv(2, ts(base), 5, "click"), SfEv(2, ts(base + 1_000), 6, "view")) // level 2
    val got = run(evs, chunks = 2)
    assert(got.toSet === expected(evs).toSet, got.sortBy(_.start_ms))
    assert(got.find(s => s.user_id == 1 && s.n_events == 3).get.level == 3L)
    assert(got.find(s => s.user_id == 1 && s.n_events == 1).get.level == 0L)
    assert(got.find(_.user_id == 2).get.level == 2L)
  }

  test("cross-batch out-of-order event near a gap boundary still merges") {
    val base = 1_700_000_000_000L
    val G = SessionFunnelStream.GapMs
    // batch 2's event sits past the gap from batch 1's session; batch 3
    // then delivers an ADMISSIBLE out-of-order event (t > watermark,
    // within the gap of both) that bridges everything into ONE session.
    // A close-on-live-arrival rule would have already emitted batch 1's
    // session and wrongly produced two (or three) sessions.
    val b1 = Seq(SfEv(1, ts(base), 1, "click"), SfEv(1, ts(base + 60_000), 2, "view"))
    val b2 = Seq(SfEv(1, ts(base + 60_000 + G + 120_000), 3, "purchase"))
    // watermark after b2 = (base+60_000+G+120_000) - 30min = base+180_000
    val b3 = Seq(SfEv(1, ts(base + 200_000), 4, "view"))
    val got = run2 (b1, b2, b3)
    val exp = expected(b1 ++ b2 ++ b3)
    assert(exp.size == 1 && exp.head.n_events == 4L, exp)
    assert(got.toSet === exp.toSet, got.sortBy(_.start_ms))
  }

  private def run2(batches: Seq[SfEv]*): Seq[SessionLevel] =
    runBatches(batches.toSeq)

  // ── applyBatch (foreachBatch DataFrame fold) ──────────────────────────

  private def readHist(dir: String): Map[Long, Long] =
    SessionFunnelStream.readLevels(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  private def histOf(evs: Seq[SfEv]): Map[Long, Long] =
    expected(evs).groupBy(_.level).view.mapValues(_.size.toLong).toMap

  test("applyBatch: empty first batch, unit levels, replay stay exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sfinc").toString
    val base = 1_700_000_000_000L
    val G = SessionFunnelStream.GapMs
    val b1 = Seq(
      SfEv(1, ts(base), 1, "click"), SfEv(1, ts(base + 60_000), 2, "view"),
      SfEv(1, ts(base + 120_000), 3, "purchase"),
      SfEv(2, ts(base), 5, "click"), SfEv(2, ts(base + 1_000), 6, "view"))
    // far-future sentinel CLOSES b1's sessions; also its own level-1 row
    val b2 = Seq(SfEv(3, ts(base + 3 * G), 7, "click"))
    SessionFunnelStream.applyBatch(Seq.empty[SfEv].toDF(), dir, 0L)
    SessionFunnelStream.applyBatch(b1.toDF(), dir, 1L)
    SessionFunnelStream.applyBatch(b1.toDF(), dir, 1L) // replayed: no-op
    SessionFunnelStream.applyBatch(b2.toDF(), dir, 2L)
    assert(readHist(dir) == histOf(b1 ++ b2))
  }

  test("applyBatch over sf0.001 slices (replay + delayed slice) equals the batch q_session_funnel") {
    val ev = graft.Tables(spark, SF, "events")
      .select("user_id", "ts", "event_id", "event_type")
    val us = F.unix_micros(F.col("ts"))
    val Array(lo, hi) = ev.select(us.as("tu"))
      .stat.approxQuantile("tu", Array(0.33, 0.66), 0.0)
    val lateLo = math.max(lo, hi - 900e6)
    val dir = java.nio.file.Files.createTempDirectory("sfinc_sf").toString
    SessionFunnelStream.applyBatch(ev.filter(us <= lo), dir, 0L)
    SessionFunnelStream.applyBatch(ev.filter(us > lo && us <= lateLo), dir, 1L)
    SessionFunnelStream.applyBatch(ev.filter(us > lo && us <= lateLo), dir, 1L)
    SessionFunnelStream.applyBatch(
      ev.filter(us > hi || (us > lateLo && us <= hi)), dir, 2L)
    val batch = graft.olap.OlapExtraQueries.qSessionFunnel(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(readHist(dir) == batch)
  }

  test("replayed sf0.001 history matches the batch sessionize+funnel replica") {
    val evs = graft.Tables(spark, SF, "events")
      .filter(F.col("event_type").isin("click", "view", "purchase"))
      .select("user_id", "ts", "event_id", "event_type")
      .limit(800).collect()
      .map(r => SfEv(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .toSeq
    val got = run(evs, chunks = 5)
    val exp = expected(evs)
    assert(got.size == exp.size, s"${got.size} sessions vs ${exp.size}")
    assert(got.toSet === exp.toSet)
    // and the LEVEL HISTOGRAM matches the batch q_session_funnel shape
    val hist = got.groupBy(_.level).view.mapValues(_.size).toMap
    val ehist = exp.groupBy(_.level).view.mapValues(_.size).toMap
    assert(hist == ehist)
  }
}
