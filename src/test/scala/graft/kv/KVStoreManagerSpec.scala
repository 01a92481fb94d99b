package graft.kv

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

class KVStoreManagerSpec extends SparkSpec {

  private def kcv(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("kk", "cc", "vv").select(
      KVStore.encLong(F.col("kk")).as("k"),
      KVStore.encLong(F.col("cc")).as("c"),
      KVStore.encLong(F.col("vv")).as("v"))
  }

  test("store lifecycle: open empty, mutateMany, read back, clear") {
    val wh = java.nio.file.Files.createTempDirectory("kvmgr").toString
    val mgr = new KVStoreManager(spark, wh)
    assert(!mgr.exists("edgestore"))
    assert(mgr.openDatabase("edgestore").count() == 0)

    // batch 1: two stores at once (batchMutation)
    mgr.mutateMany(Map(
      "edgestore" -> ((kcv(Seq((1, 1, 10), (1, 2, 20), (2, 1, 30))), kcv(Nil).select("k", "c"))),
      "indexstore" -> ((kcv(Seq((5, 5, 50))), kcv(Nil).select("k", "c")))))
    assert(mgr.exists("edgestore") && mgr.exists("indexstore"))
    assert(mgr.openDatabase("edgestore").count() == 3)

    // batch 2: upsert (1,1)->11 and delete (1,2); deletions before adds
    mgr.mutateMany(Map(
      "edgestore" -> ((kcv(Seq((1, 1, 11))), kcv(Seq((1, 2, 0))).select("k", "c")))))
    val rows = mgr.openDatabase("edgestore")
      .select(KVStore.decLong(F.col("k"), 1).as("kk"),
        KVStore.decLong(F.col("c"), 1).as("cc"),
        KVStore.decLong(F.col("v"), 1).as("vv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 1L, 11L), (2L, 1L, 30L)), rows)

    mgr.clearStorage()
    assert(!mgr.exists("edgestore") && !mgr.exists("indexstore"))
  }
}
