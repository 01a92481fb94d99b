package graft.kv

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

// binary-domain mutation rows built from longs for readability
// (top-level: nested/private case classes break codegen'd encoders)
case class MutRow(key: Long, col: Long, value: String, is_delete: Boolean)

class KVStreamSinkSpec extends SparkSpec {

  private def toMutations(df: org.apache.spark.sql.DataFrame) =
    df.select(
      KVStore.encLong(F.col("key")).as("k"),
      KVStore.encLong(F.col("col")).as("c"),
      F.col("value").cast("binary").as("v"),
      F.col("is_delete"))

  private def decodedSet(df: org.apache.spark.sql.DataFrame) =
    df.select(KVStore.decLong(F.col("k"), 1), KVStore.decLong(F.col("c"), 1),
      F.col("v").cast("string")).collect().map(_.toSeq).toSet

  test("streamed mutation batches fold to the same store as sequential batch mutate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_kvsink").toString
    val in = MemoryStream[MutRow]
    val q = KVStreamSink.start(toMutations(in.toDF()), dir)
    try {
      in.addData(MutRow(1, 10, "a", false), MutRow(1, 11, "b", false),
        MutRow(2, 10, "c", false))
      q.processAllAvailable()
      // delete (1,10), upsert (1,11)->B, add (3,10)
      in.addData(MutRow(1, 10, "", true), MutRow(1, 11, "B", false),
        MutRow(3, 10, "d", false))
      q.processAllAvailable()
      val got = decodedSet(KVStreamSink.read(spark, dir))
      assert(got == Set(Seq(1L, 11L, "B"), Seq(2L, 10L, "c"), Seq(3L, 10L, "d")), got)
    } finally q.stop()
  }

  test("a replayed batch is a no-op (idempotent by batchId)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_kvsink2").toString
    val b0 = toMutations(Seq(MutRow(1, 1, "x", false)).toDF())
    val b1 = toMutations(Seq(MutRow(1, 1, "y", false), MutRow(2, 1, "z", false)).toDF())
    KVStreamSink.applyBatch(b0, dir, 0L)
    KVStreamSink.applyBatch(b1, dir, 1L)
    val before = decodedSet(KVStreamSink.read(spark, dir))
    KVStreamSink.applyBatch(b1, dir, 1L) // redelivery
    KVStreamSink.applyBatch(b0, dir, 0L) // stale redelivery
    assert(decodedSet(KVStreamSink.read(spark, dir)) == before)
    assert(before == Set(Seq(1L, 1L, "y"), Seq(2L, 1L, "z")))
  }
}
