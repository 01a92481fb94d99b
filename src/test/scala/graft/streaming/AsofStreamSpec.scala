package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.streaming.AsofStream.{AsofHit, AsofMsg}

case class LRow(k: Long, ts: Timestamp, event_id: Long)
case class RRow(k: Long, rts: Timestamp, rid: Long)

class AsofStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  /** Drive both memory streams with chronologically ordered chunks (so
    * nothing is late beyond watermark), close with far-future sentinels
    * that push the watermark past every real event, and collect hits. */
  private def run(lefts: Seq[LRow], rights: Seq[RRow], chunks: Int,
                  retentionMs: Long = 24 * 3600 * 1000L): Seq[AsofHit] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val inL = MemoryStream[LRow]
    val inR = MemoryStream[RRow]
    val joined = AsofStream.asofJoin(inL.toDF(), inR.toDF(), "1 second",
      retentionMs)
    val q = joined.writeStream.format("memory")
      .queryName("asof_hits").outputMode("append").start()
    try {
      val lSorted = lefts.sortBy(_.ts.getTime)
      val rSorted = rights.sortBy(_.rts.getTime)
      val maxT = (lefts.map(_.ts.getTime) ++ rights.map(_.rts.getTime)).max
      val bounds = (1 to chunks).map(i =>
        if (i == chunks) Long.MaxValue
        else lSorted.map(_.ts.getTime).min + i * (maxT - lSorted.map(_.ts.getTime).min) / chunks)
      var doneL = 0; var doneR = 0
      bounds.foreach { b =>
        val nl = lSorted.drop(doneL).takeWhile(_.ts.getTime <= b)
        val nr = rSorted.drop(doneR).takeWhile(_.rts.getTime <= b)
        doneL += nl.size; doneR += nr.size
        if (nl.nonEmpty) inL.addData(nl: _*)
        if (nr.nonEmpty) inR.addData(nr: _*)
        q.processAllAvailable()
      }
      // sentinels advance the watermark past every real event; two rounds
      // so flush timeouts (armed when the first sentinel batch completes)
      // actually fire
      inL.addData(LRow(-1L, ts(maxT + 3600_000L), -1L))
      inR.addData(RRow(-1L, ts(maxT + 3600_000L), -1L))
      q.processAllAvailable()
      inL.addData(LRow(-1L, ts(maxT + 7200_000L), -2L))
      q.processAllAvailable()
      spark.table("asof_hits").as[AsofHit].collect().toSeq
        .filter(_.k >= 0) // drop sentinel hits
    } finally q.stop()
  }

  /** Reference: plain-Scala as-of over the full history. */
  private def expected(lefts: Seq[LRow], rights: Seq[RRow]): Set[AsofHit] =
    lefts.map { l =>
      val best = rights.filter(r => r.k == l.k && r.rts.getTime <= l.ts.getTime)
        .sortBy(r => (r.rts.getTime, r.rid)).lastOption
      AsofHit(l.k, l.event_id, l.ts.getTime,
        best.map(_.rts.getTime), best.map(_.rid))
    }.toSet

  test("tie, unmatched, and LOCF semantics match the batch contract") {
    val base = 1_700_000_000_000L
    val lefts = Seq(
      LRow(1, ts(base + 10_000), 100), // after both t=5s rows → tie, rid 12
      LRow(1, ts(base + 4_000), 101),  // before any right → unmatched
      LRow(2, ts(base + 50_000), 102), // LOCF across a long gap
      LRow(3, ts(base + 10_000), 103)) // key with no rights at all
    val rights = Seq(
      RRow(1, ts(base + 5_000), 11), RRow(1, ts(base + 5_000), 12),
      RRow(2, ts(base + 1_000), 13))
    val got = run(lefts, rights, chunks = 2)
    assert(got.toSet === expected(lefts, rights))
    assert(got.size == 4)
    val tie = got.find(_.event_id == 100).get
    assert(tie.ref_id.contains(12L), s"tie must pick the largest rid: $tie")
    assert(got.find(_.event_id == 101).get.ref_id.isEmpty)
    assert(got.find(_.event_id == 103).get.ref_id.isEmpty)
  }

  test("replayed sf0.001 history matches the batch as-of exactly") {
    val ev = graft.Tables(spark, SF, "events")
      .select(F.col("user_id").as("k"), F.col("ts"), F.col("event_id"))
      .limit(400).collect()
      .map(r => LRow(r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSeq
    val ord = graft.Tables(spark, SF, "orders")
      .select(F.col("o_custkey").cast("long").as("k"),
        F.col("o_orderdate").cast("timestamp").as("rts"),
        F.col("o_orderkey").cast("long").as("rid"))
      .collect()
      .map(r => RRow(r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSeq
    val got = run(ev, ord, chunks = 4)
    assert(got.size == ev.size, s"${got.size} hits for ${ev.size} events")
    assert(got.toSet === expected(ev, ord))
  }

  test("state compacts to one remembered row per key; idle keys evict") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = 1_700_000_000_000L
    val inL = MemoryStream[LRow]
    val inR = MemoryStream[RRow]
    // tiny idle retention: one minute of event time
    val joined = AsofStream.asofJoin(inL.toDF(), inR.toDF(), "1 second", 60_000L)
    val q = joined.writeStream.format("memory")
      .queryName("asof_state").outputMode("append").start()
    try {
      // many right rows for ONE key, all finalized by the watermark →
      // state must compact them to a single remembered row
      inR.addData((1 to 50).map(i => RRow(7, ts(base + i * 100L), i.toLong)): _*)
      q.processAllAvailable()
      inL.addData(LRow(7, ts(base + 10_000), 1))
      q.processAllAvailable()
      // the union watermark is the MIN over both inputs — advance BOTH
      inL.addData(LRow(-1, ts(base + 20_000), -1))
      inR.addData(RRow(-1, ts(base + 20_000), -1))
      q.processAllAvailable()
      inL.addData(LRow(-1, ts(base + 30_000), -5)) // fire the flush timeout
      inR.addData(RRow(-1, ts(base + 30_000), -5))
      q.processAllAvailable()
      val hits = spark.table("asof_state").as[AsofHit].collect()
      assert(hits.exists(h => h.event_id == 1 && h.ref_id.contains(50L)))
      val rows = q.lastProgress.stateOperators.asScala.map(_.numRowsTotal).sum
      assert(rows <= 2, s"state should be ~1 row per active key, got $rows")
      // idle eviction: march event time far past the retention horizon
      // (both streams, to move the min-watermark)
      inL.addData(LRow(-1, ts(base + 600_000L), -2))
      inR.addData(RRow(-1, ts(base + 600_000L), -2))
      q.processAllAvailable()
      inL.addData(LRow(-1, ts(base + 1_200_000L), -3))
      inR.addData(RRow(-1, ts(base + 1_200_000L), -3))
      q.processAllAvailable()
      inL.addData(LRow(-1, ts(base + 1_800_000L), -4))
      inR.addData(RRow(-1, ts(base + 1_800_000L), -4))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.asScala.map(_.numRowsTotal).sum
      assert(after <= 1, s"idle keys must evict, state rows=$after")
    } finally q.stop()
  }

  private implicit class ArrOps[T](a: Array[T]) {
    def asScala: Seq[T] = a.toSeq
  }
}
