package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** MarkovSink: the incrementally-maintained transition matrix must
  * equal the batch lead-window computation over full history, count a
  * user's boundary pair (last event in batch N, next in batch N+1)
  * exactly once, and be idempotent under batch replay. */
class MarkovSinkSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  test("unit: cross-batch boundary pairs count once; replay is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mk_spec").toString
    val base = 1_700_000_000_000L
    val b0 = Seq((1L, ts(base), 1L, "click"), (1L, ts(base + 1000), 2L, "view"),
      (2L, ts(base), 3L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val b1 = Seq((1L, ts(base + 2000), 4L, "purchase"), // boundary: view→purchase
      (2L, ts(base + 2000), 5L, "click"))               // boundary: view→click
      .toDF("user_id", "ts", "event_id", "event_type")
    MarkovSink.applyBatch(b0, dir, 0L)
    MarkovSink.applyBatch(b1, dir, 1L)
    MarkovSink.applyBatch(b1, dir, 1L) // replay: must not double-count
    val got = MarkovSink.read(spark, dir)
      .select("event_type", "next_type", "n").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(("click", "view") -> 1L, ("view", "purchase") -> 1L,
      ("view", "click") -> 1L), got)
  }

  test("unit: cross-batch OUT-OF-ORDER event within the delay sorts exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mk_spec_ooo").toString
    val base = 1_700_000_000_000L
    // batch 0 delivers t=0s and t=100s; the t=50s event is late, arriving
    // in batch 1 — disorder well inside the 30-minute delay, so the true
    // in-order chain click→view→purchase must be what gets counted
    val b0 = Seq((1L, ts(base), 1L, "click"), (1L, ts(base + 100_000), 3L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val b1 = Seq((1L, ts(base + 50_000), 2L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    MarkovSink.applyBatch(b0, dir, 0L)
    MarkovSink.applyBatch(b1, dir, 1L)
    val got = MarkovSink.read(spark, dir)
      .select("event_type", "next_type", "n").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(("click", "view") -> 1L, ("view", "purchase") -> 1L), got)
  }

  test("unit: event behind the sealed frontier is dropped, not miscounted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mk_spec_late").toString
    val base = 1_700_000_000_000L
    // delay=1s: batch 0's watermark (t=10s-1s) seals t=0s and t=2s, so the
    // sealed frontier is t=2s; batch 1's t=1s event is beyond-watermark
    // late → dropped entirely (the pre-r8 code would have silently lost
    // the view→purchase pair AND folded a phantom pair instead)
    val b0 = Seq((1L, ts(base), 1L, "click"), (1L, ts(base + 2000), 2L, "view"),
      (1L, ts(base + 10_000), 4L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val b1 = Seq((1L, ts(base + 1000), 3L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    MarkovSink.applyBatch(b0, dir, 0L, delayMs = 1000L)
    MarkovSink.applyBatch(b1, dir, 1L, delayMs = 1000L)
    val got = MarkovSink.read(spark, dir)
      .select("event_type", "next_type", "n").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(("click", "view") -> 1L, ("view", "purchase") -> 1L), got)
  }

  test("replayed sf0.001 history equals the batch transition matrix") {
    val dir = java.nio.file.Files.createTempDirectory("mk_spec2").toString
    val ev = graft.Tables(spark, SF, "events")
      .select("user_id", "ts", "event_id", "event_type")
    // split by time so sequences span batches
    val cut = ev.select(F.unix_micros(F.col("ts")).as("tu"))
      .stat.approxQuantile("tu", Array(0.5), 0.0)(0)
    MarkovSink.applyBatch(ev.filter(F.unix_micros(F.col("ts")) <= cut), dir, 0L)
    MarkovSink.applyBatch(ev.filter(F.unix_micros(F.col("ts")) > cut), dir, 1L)
    val got = MarkovSink.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val exp = graft.olap.OlapSeriesQueries.qMarkov(spark, SF).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === exp)
  }
}
