package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.streaming.JourneyStream.{JEv, SessionPath}

/** Streaming journeys must equal the batch sessionize+path replica
  * (including the cross-batch out-of-order gap-boundary case), and the
  * applyBatch/readTop composition (journey buffer fold → TopKSink) must
  * maintain the exact journey counts through empty batches, in-delay
  * late arrivals and batch replays. */
class JourneyStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  /** Timestamp → epoch µs (the getNanos carry — main's usOf contract). */
  private def usOf(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def runBatches(batches: Seq[Seq[JEv]]): Seq[SessionPath] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[JEv]
    val q = JourneyStream.paths(in.toDF())
      .writeStream.format("memory").queryName("j_paths")
      .outputMode("append").start()
    try {
      batches.foreach { g => in.addData(g: _*); q.processAllAvailable() }
      val maxT = batches.flatten.map(_.ts.getTime).max
      (1 to 3).foreach { i =>
        in.addData(JEv(-1, ts(maxT + i * 7_200_000L), -i, "click"))
        q.processAllAvailable()
      }
      spark.table("j_paths").as[SessionPath].collect().toSeq
        .filter(_.user_id >= 0)
    } finally { q.stop(); spark.catalog.dropTempView("j_paths") }
  }

  /** Batch replica: µs-exact (t, id) sort per user, gap fold, 3-prefix
    * path — the same contract as main's flatMapGroupsWithState fold. */
  private def expected(evs: Seq[JEv]): Seq[SessionPath] =
    evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (usOf(e.ts), e.event_id))
      val sessions = sorted.foldLeft(Vector.empty[Vector[JEv]]) { (acc, e) =>
        if (acc.nonEmpty &&
            usOf(e.ts) - usOf(acc.last.last.ts) <= JourneyStream.GapUs)
          acc.init :+ (acc.last :+ e)
        else acc :+ Vector(e)
      }
      sessions.map { s =>
        SessionPath(u, usOf(s.head.ts), usOf(s.last.ts), s.size.toLong,
          s.take(3).map(_.event_type).mkString(">"))
      }
    }

  /** Exact path histogram of the batch replica. */
  private def expectedCounts(evs: Seq[JEv]): Map[String, Long] =
    expected(evs).groupBy(_.path).view.mapValues(_.size.toLong).toMap

  test("cross-batch out-of-order event near a gap boundary keeps one path") {
    val base = 1_700_000_000_000L
    val G = JourneyStream.GapMs
    val b1 = Seq(JEv(1, ts(base), 1, "view"), JEv(1, ts(base + 60_000), 2, "click"))
    val b2 = Seq(JEv(1, ts(base + 60_000 + G + 120_000), 3, "purchase"))
    val b3 = Seq(JEv(1, ts(base + 200_000), 4, "signup")) // admissible, merges all
    val got = runBatches(Seq(b1, b2, b3))
    val exp = expected(b1 ++ b2 ++ b3)
    assert(exp.size == 1 && exp.head.path == "view>click>signup", exp)
    assert(got.toSet === exp.toSet, got.sortBy(_.start_us))
  }

  test("replayed sf0.001 history matches the batch paths; TopKSink maintains exact journey counts") {
    val evs = graft.Tables(spark, SF, "events")
      .select("user_id", "ts", "event_id", "event_type")
      .limit(800).collect()
      .map(r => JEv(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .toSeq
    val sorted = evs.sortBy(e => (usOf(e.ts), e.event_id))
    val got = runBatches(sorted.grouped(math.max(1, sorted.size / 5)).toSeq)
    val exp = expected(evs)
    assert(got.size == exp.size && got.toSet === exp.toSet)

    // compose: emitted paths → TopKSink(termCol = "path"), 3 batches + replay
    import spark.implicits._
    val dir = Files.createTempDirectory("journeys").toString
    val chunks = got.grouped(math.max(1, got.size / 3)).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      TopKSink.applyBatch(c.toDF(), dir, i.toLong, capacity = 256, termCol = "path")
    }
    TopKSink.applyBatch(chunks.head.toDF(), dir, 0L, capacity = 256, termCol = "path")
    val maintained = TopKSink.read(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    val true_ = got.groupBy(_.path).view.mapValues(_.size.toLong).toMap
    // distinct paths ≤ capacity → Misra-Gries is exact
    assert(true_.size <= 256)
    assert(maintained == true_)
  }

  // ── applyBatch (foreachBatch DataFrame fold) ──────────────────────────

  private def toDf(evs: Seq[JEv]): DataFrame = {
    import spark.implicits._
    evs.toDF()
  }

  private def readCounts(jDir: String, tDir: String): Map[String, Long] =
    JourneyStream.readTop(spark, jDir, tDir, k = 1000).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap

  test("applyBatch: empty first batch keeps the watermark unsealed (no underflow)") {
    val snap = Files.createTempDirectory("jinc_empty")
    val (jDir, tDir) = (snap.resolve("j").toString, snap.resolve("t").toString)
    val base = 1_700_000_000_000L
    JourneyStream.applyBatch(toDf(Nil), jDir, 0L, tDir)
    val b1 = Seq(JEv(1, ts(base), 1, "view"), JEv(1, ts(base + 60_000), 2, "click"))
    JourneyStream.applyBatch(toDf(b1), jDir, 1L, tDir)
    // an underflowed watermark would have dropped ALL of b1 forever
    assert(readCounts(jDir, tDir) == expectedCounts(b1))
  }

  test("applyBatch: cross-batch out-of-order within delay, replay, and empty mid-batch stay exact") {
    val snap = Files.createTempDirectory("jinc_ooo")
    val (jDir, tDir) = (snap.resolve("j").toString, snap.resolve("t").toString)
    val base = 1_700_000_000_000L
    val G = JourneyStream.GapMs
    // b0: user 1 session start; user 2 lone event
    val b0 = Seq(JEv(1, ts(base), 1, "view"), JEv(2, ts(base + 10_000), 2, "cart"))
    // b1: advances time far enough to CLOSE b0's sessions (> gap + delay)
    val b1 = Seq(JEv(1, ts(base + 2 * G + 3_600_000L), 3, "purchase"))
    // b2: in-delay out-of-order arrival — merges into b1's still-open session
    val b2 = Seq(JEv(1, ts(base + 2 * G + 3_660_000L), 4, "click"),
                 JEv(1, ts(base + 2 * G + 3_500_000L), 5, "signup"))
    JourneyStream.applyBatch(toDf(b0), jDir, 0L, tDir)
    JourneyStream.applyBatch(toDf(b1), jDir, 1L, tDir)
    JourneyStream.applyBatch(toDf(b1), jDir, 1L, tDir) // replayed batchId: no-op
    JourneyStream.applyBatch(toDf(Nil), jDir, 2L, tDir) // empty mid-batch
    JourneyStream.applyBatch(toDf(b2), jDir, 3L, tDir)
    val all = b0 ++ b1 ++ b2
    // the late signup must have been sorted BEFORE purchase/click
    assert(expectedCounts(all).contains("purchase>signup>click") == false)
    assert(readCounts(jDir, tDir) == expectedCounts(all))
  }

  test("applyBatch over sf0.001 slices equals the batch q_journey histogram") {
    val ev = graft.Tables(spark, SF, "events")
      .select("user_id", "ts", "event_id", "event_type")
    val us = F.unix_micros(F.col("ts"))
    val Array(lo, hi) = ev.select(us.as("tu"))
      .stat.approxQuantile("tu", Array(0.33, 0.66), 0.0)
    val snap = Files.createTempDirectory("jinc_sf")
    val (jDir, tDir) = (snap.resolve("j").toString, snap.resolve("t").toString)
    JourneyStream.applyBatch(ev.filter(us <= lo), jDir, 0L, tDir)
    JourneyStream.applyBatch(ev.filter(us > lo && us <= hi), jDir, 1L, tDir)
    JourneyStream.applyBatch(ev.filter(us > hi), jDir, 2L, tDir)
    val got = readCounts(jDir, tDir)
    val evs = ev.collect().map(r =>
      JEv(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expectedCounts(evs))
  }
}
