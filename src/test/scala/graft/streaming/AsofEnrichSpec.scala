package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import EventStream.Ev

/** Stream-static as-of enrichment must match the batch as-of contract on
  * every delivered event: last ref row with rt ≤ event time, ties to the
  * largest rid, null when nothing qualifies. */
class AsofEnrichSpec extends SparkSpec {

  private def ts(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  test("each event picks the last ref at-or-before its time") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // ref times are epoch-µs, matching unix_micros(ts)
    val ref = Seq(
      (1L, 60000000L, 11L), (1L, 60000000L, 12L), // tie → 12
      (1L, 120000000L, 13L),
      (2L, 300000000L, 21L))
      .toDF("k", "rt", "rid")
    val in = MemoryStream[Ev]
    val out = EventStream.asofEnrich(in.toDF(), ref)
    val q = out.writeStream.format("memory").queryName("asof_enrich")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts(59000000L), "click", 1.0),  // before every ref → null
        Ev(1, ts(60000000L), "view", 1.0),   // tie at 60s → rid 12
        Ev(1, ts(200000000L), "click", 1.0), // after 120s → rid 13
        Ev(2, ts(301000000L), "click", 1.0), // → 21
        Ev(3, ts(100000000L), "click", 1.0)) // unknown key → null
      q.processAllAvailable()
      val got = spark.table("asof_enrich")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
      assert(got === Set(
        (1L, 59000L, None),
        (1L, 60000L, Some(12L)),
        (1L, 200000L, Some(13L)),
        (2L, 301000L, Some(21L)),
        (3L, 100000L, None)))
    } finally q.stop()
  }
}
