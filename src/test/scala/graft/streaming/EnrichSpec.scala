package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import EventStream.Ev

class EnrichSpec extends SparkSpec {

  test("stream-static join enriches events with the customer dimension") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = graft.Tables(spark, SF, "customer")
      .select(F.col("c_custkey").cast("long").as("user_id"), F.col("c_mktsegment"))
    val in = MemoryStream[Ev]
    val q = EventStream.enrichWithDim(in.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Ev(1, new Timestamp(86400000L), "click", 1.0),
        Ev(2, new Timestamp(86460000L), "view", 2.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_out")
        .select("user_id", "c_mktsegment").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = dim.filter(F.col("user_id").isin(1L, 2L)).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows == expect, s"got $rows expected $expect")
    } finally q.stop()
  }
}
