package graft.kv

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

/** The bucketed persistence path: a store bucketed by `k` must join on
  * `k` without shuffling the bucketed side (the 100 TB co-location
  * story from SURVEY §5). */
class KVBucketSpec extends SparkSpec {

  test("bucketed store self-join on k plans no shuffle on the bucketed sides") {
    import spark.implicits._
    val store = (1L to 1000L).flatMap(k => (1 to 3).map(c => (k, c.toLong, k * c)))
      .toDF("kk", "cc", "vv")
      .select(KVStore.encLong(F.col("kk")).as("k"), KVStore.encLong(F.col("cc")).as("c"),
        KVStore.encLong(F.col("vv")).as("v"))
    KVStore.writeBucketed(store, "kv_bucket_spec", numBuckets = 8)
    try {
      val t1 = spark.table("kv_bucket_spec")
      val t2 = spark.table("kv_bucket_spec").select(F.col("k"), F.col("v").as("v2"))
      val joined = t1.join(t2, "k")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 9000) // 3 cols × 3 cols per key × 1000 keys
    } finally spark.sql("DROP TABLE IF EXISTS kv_bucket_spec")
  }
}
