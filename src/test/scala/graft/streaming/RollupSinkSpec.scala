package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import EventStream.Ev

/** The materialized rollup must equal the batch aggregate over all
  * delivered events, stay current across micro-batches, and be
  * idempotent under batch replay. */
class RollupSinkSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60 * 1000L)

  test("stream-maintained rollup equals the batch groupBy and survives replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("rollup").toString
    val in = MemoryStream[Ev]
    val q = RollupSink.start(in.toDF(), dir)
    try {
      val b1 = Seq(Ev(1, ts(1), "click", 1.25), Ev(2, ts(2), "view", 2.50),
        Ev(3, ts(3), "click", 0.75))
      val b2 = Seq(Ev(1, ts(4), "click", 4.00), Ev(2, ts(5), "purchase", 10.00))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val all = (b1 ++ b2).toDF()
        .select(F.col("event_type"),
          F.expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("vc"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).as("n"), F.sum("vc").as("sum_c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      def state() = RollupSink.read(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(state() === all)
      // replaying an already-complete batch must be a no-op
      RollupSink.applyBatch(b2.toDF(), dir, 1L)
      assert(state() === all)
    } finally q.stop()
  }
}
