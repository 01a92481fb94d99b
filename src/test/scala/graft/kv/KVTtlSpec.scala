package graft.kv

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** MergeTree-style TTL: expire() deletes exactly the cells whose WINNING
  * write is older than the horizon (an overwrite refreshes a cell's
  * age), the deletion rides the ordinary mutation log (no base rewrite),
  * ages survive compaction, and a later re-add resurrects the cell. */
class KVTtlSpec extends SparkSpec {

  private def kcv(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("kk", "cc", "vv").select(
      KVStore.encLong(F.col("kk")).as("k"),
      KVStore.encLong(F.col("cc")).as("c"),
      KVStore.encLong(F.col("vv")).as("v"))
  }

  private def decode(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(KVStore.decLong(F.col("k"), 1), KVStore.decLong(F.col("c"), 1),
      KVStore.decLong(F.col("v"), 1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("expire honors winning-write age, survives compaction, allows resurrection") {
    val wh = java.nio.file.Files.createTempDirectory("kvttl").toString
    val ds = new KVDeltaStore(spark, wh)
    val noDel = kcv(Nil).select("k", "c")

    // t=100: three cells; t=200: (1,1) overwritten (age refreshed) + new (4,1)
    ds.appendMutation("t", kcv(Seq((1, 1, 10), (2, 1, 20), (3, 1, 30))), noDel, wts = 100)
    ds.appendMutation("t", kcv(Seq((1, 1, 11), (4, 1, 40))), noDel, wts = 200)

    // horizon 150: (2,1) and (3,1) expire; (1,1) was refreshed at 200
    assert(ds.expire("t", olderThan = 150, wts = 300) === 2)
    assert(decode(ds.openDatabase("t")) === Set((1L, 1L, 11L), (4L, 1L, 40L)))
    // idempotent at the same horizon
    assert(ds.expire("t", olderThan = 150, wts = 301) === 0)

    // ages survive compaction: fold to base, then expire past t=200
    ds.compact("t")
    assert(ds.logDepth("t") === 0)
    assert(decode(ds.openDatabase("t")) === Set((1L, 1L, 11L), (4L, 1L, 40L)))
    assert(ds.expire("t", olderThan = 250, wts = 400) === 2)
    assert(decode(ds.openDatabase("t")) === Set.empty[(Long, Long, Long)])

    // resurrection: a fresh add of an expired cell lives under the old horizon
    ds.appendMutation("t", kcv(Seq((2, 1, 21))), noDel, wts = 500)
    assert(decode(ds.openDatabase("t")) === Set((2L, 1L, 21L)))
    assert(ds.expire("t", olderThan = 250, wts = 600) === 0)
    assert(decode(ds.openDatabase("t")) === Set((2L, 1L, 21L)))
  }
}
