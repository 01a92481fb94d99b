package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import EventStream.Ev

/** The stream-maintained CUSUM monitor must equal the batch q_cusum fold
  * over all delivered events (same k, same final/max CUSUM), stay current
  * across micro-batches, and be idempotent under batch replay. */
class CusumSinkSpec extends SparkSpec {

  private def ts(days: Long, minutes: Long): Timestamp =
    new Timestamp((days * 1440 + minutes) * 60 * 1000L)

  private def batchReplica(events: Seq[Ev]) = {
    import spark.implicits._
    val daily = events.toDF()
      .select(F.col("event_type"),
        F.expr("unix_micros(ts) div 86400000000").as("d"),
        F.expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("vc"))
      .groupBy("event_type", "d").agg(F.sum("vc").as("x"))
    graft.olap.OlapSeriesQueries.cusumOverDaily(daily)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
  }

  test("stream-maintained CUSUM equals the batch fold and survives replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("cusum").toString
    val in = MemoryStream[Ev]
    val q = CusumSink.start(in.toDF(), dir)
    try {
      // day 0 and 1 quiet, day 2 a level shift on clicks — split across
      // micro-batches so day 1's sum accumulates from BOTH batches
      val b1 = Seq(Ev(1, ts(0, 1), "click", 1.00), Ev(2, ts(0, 2), "view", 2.00),
        Ev(3, ts(1, 1), "click", 1.50))
      val b2 = Seq(Ev(4, ts(1, 2), "click", 0.50), Ev(5, ts(2, 1), "click", 9.00),
        Ev(6, ts(2, 2), "click", 8.00), Ev(7, ts(2, 3), "view", 2.00))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      def state() = CusumSink.monitor(spark, dir)
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val expect = batchReplica(b1 ++ b2)
      assert(state() === expect)
      // sanity on the click series itself: days (100, 200, 1700) cents,
      // k = 666, cusum walks 0, 0, 1034 — the shift is flagged
      assert(expect("click") === ((3L, 666L, 1034L, 1034L)))
      // replaying an already-complete batch must be a no-op
      CusumSink.applyBatch(b2.toDF(), dir, 1L)
      assert(state() === expect)
    } finally q.stop()
  }
}
