package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** One streamed order row. */
case class Ord(o_custkey: Long, o_totalprice: Double)

/** The maintained per-customer revenue state must equal the batch
  * groupBy over all delivered orders, survive batch replay, and feed the
  * shared concentration fold with the batch answer. */
class ParetoSinkSpec extends SparkSpec {

  test("stream-maintained revenue partials equal the batch groupBy and survive replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("pareto").toString
    val in = MemoryStream[Ord]
    val q = ParetoSink.start(in.toDF(), dir)
    try {
      val b1 = Seq(Ord(1, 100.25), Ord(2, 50.50), Ord(1, 10.00))
      val b2 = Seq(Ord(2, 0.25), Ord(3, 9999.99))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val all = (b1 ++ b2).toDF()
        .groupBy("o_custkey")
        .agg(F.sum(F.expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")).as("rc"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def state() = ParetoSink.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(state() === all)
      // replaying an already-complete batch must be a no-op
      ParetoSink.applyBatch(b2.toDF(), dir, 1L)
      assert(state() === all)
      // the maintained state feeds the shared concentrate with the batch answer
      val viaSink = graft.olap.OlapBizQueries
        .concentrate(ParetoSink.read(spark, dir)).collect().head
      val viaBatch = graft.olap.OlapBizQueries
        .concentrate((b1 ++ b2).toDF().groupBy("o_custkey")
          .agg(F.sum(F.expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")).as("rc")))
        .collect().head
      assert(viaSink.toSeq == viaBatch.toSeq)
    } finally q.stop()
  }

  test("q_pareto_inc equals q_pareto on real data") {
    val inc = graft.olap.OlapBizQueries.qParetoInc(spark, SF).collect().head
    val batch = graft.olap.OlapBizQueries.qPareto(spark, SF).collect().head
    assert(inc.toSeq == batch.toSeq)
  }
}
