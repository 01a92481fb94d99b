package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.streaming.AttributionStream.Attribution

case class AEv(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)

class AttributionStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)
  private val Look = 60_000L // 1-minute lookback for the unit scenarios

  private def run(evs: Seq[AEv], chunks: Int): Seq[Attribution] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[AEv]
    val q = AttributionStream.lastTouch(in.toDF(), "1 second", Look)
      .writeStream.format("memory").queryName("attr_hits")
      .outputMode("append").start()
    try {
      val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val per = math.max(1, sorted.size / chunks)
      sorted.grouped(per).foreach { g =>
        in.addData(g: _*); q.processAllAvailable()
      }
      val maxT = evs.map(_.ts.getTime).max
      in.addData(AEv(-1, ts(maxT + 3_600_000L), -1, "purchase"))
      q.processAllAvailable()
      in.addData(AEv(-1, ts(maxT + 7_200_000L), -2, "purchase"))
      q.processAllAvailable()
      spark.table("attr_hits").as[Attribution].collect().toSeq.filter(_.user >= 0)
    } finally q.stop()
  }

  private def expected(evs: Seq[AEv]): Set[Attribution] =
    evs.filter(_.event_type == "purchase").map { p =>
      val inWin = evs
        .filter(e => e.user_id == p.user_id &&
          (e.event_type == "click" || e.event_type == "view") &&
          e.ts.getTime < p.ts.getTime &&
          e.ts.getTime >= p.ts.getTime - Look)
        .sortBy(e => (e.ts.getTime, e.event_id))
      val last = inWin.lastOption
      Attribution(p.user_id, p.event_id, p.ts.getTime,
        last.map(_.event_id), last.map(e => if (e.event_type == "click") "c" else "v"),
        last.map(_.ts.getTime), inWin.size.toLong)
    }.toSet

  test("last-touch, window exclusion, and unattributed purchases") {
    val base = 1_700_000_000_000L
    val evs = Seq(
      AEv(1, ts(base + 1_000), 10, "click"),
      AEv(1, ts(base + 30_000), 11, "view"),   // latest in window → credited
      AEv(1, ts(base + 50_000), 12, "purchase"),
      AEv(1, ts(base + 200_000), 13, "purchase"), // both touches aged out → null
      AEv(2, ts(base + 10_000), 14, "purchase"),  // no touches at all
      AEv(3, ts(base + 5_000), 15, "click"),
      AEv(3, ts(base + 5_000), 16, "view"),       // same ms: larger id wins
      AEv(3, ts(base + 6_000), 17, "purchase"))
    val got = run(evs, chunks = 2)
    assert(got.toSet === expected(evs))
    val p12 = got.find(_.purchase_id == 12).get
    assert(p12.touch_id.contains(11L) && p12.touch_kind.contains("v") &&
      p12.n_window == 2)
    assert(got.find(_.purchase_id == 13).get.touch_id.isEmpty)
    assert(got.find(_.purchase_id == 14).get.touch_id.isEmpty)
    assert(got.find(_.purchase_id == 17).get.touch_id.contains(16L))
  }

  test("replayed sf0.001 history matches the batch window semantics") {
    val evs = graft.Tables(spark, SF, "events")
      .filter(F.col("event_type").isin("click", "view", "purchase"))
      .select("user_id", "ts", "event_id", "event_type")
      .limit(600).collect()
      .map(r => AEv(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .toSeq
    val got = run(evs, chunks = 4)
    assert(got.size == evs.count(_.event_type == "purchase"))
    assert(got.toSet === expected(evs))
  }

  test("touch state evicts past the lookback horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = 1_700_000_000_000L
    val in = MemoryStream[AEv]
    val q = AttributionStream.lastTouch(in.toDF(), "1 second", Look)
      .writeStream.format("memory").queryName("attr_state")
      .outputMode("append").start()
    try {
      in.addData((1 to 40).map(i => AEv(9, ts(base + i * 100L), i.toLong, "click")): _*)
      q.processAllAvailable()
      // advance the watermark far past base + lookback: all 40 touches
      // age out and the idle key evicts
      in.addData(AEv(-1, ts(base + 300_000L), -1, "purchase"))
      q.processAllAvailable()
      in.addData(AEv(-1, ts(base + 600_000L), -2, "purchase"))
      q.processAllAvailable()
      in.addData(AEv(-1, ts(base + 900_000L), -3, "purchase"))
      q.processAllAvailable()
      val rows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(rows <= 1, s"aged-out touch state must evict, rows=$rows")
    } finally q.stop()
  }
}
