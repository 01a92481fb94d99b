package graft.kv

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** keySlices = getKeys(KeyRangeQuery) with per-key column-sliced entries
  * (the reference's RowIterator consumption shape): it must equal the
  * keyScan × slice composition AND execute as ONE parquet scan with both
  * range predicates pushed — no per-key driver iteration. */
class KVKeySlicesSpec extends SparkSpec {

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

  test("keySlices equals the keyScan x slice composition") {
    val store = kcv(for (k <- 1L to 20L; c <- 1L to 10L) yield (k, c, k * 100 + c))
    val got = KVStore.keySlices(store,
      KVStore.encLong(F.lit(5L)), KVStore.encLong(F.lit(15L)),
      KVStore.encLong(F.lit(3L)), KVStore.encLong(F.lit(9L)), limit = 4)
    // composition: the distinct keys of the range, then the column slice
    val keys = KVStore.keyScan(store,
      KVStore.encLong(F.lit(5L)), KVStore.encLong(F.lit(15L)))
    val ref = KVStore.slice(store, keys,
      KVStore.encLong(F.lit(3L)), KVStore.encLong(F.lit(9L)), limit = 4)
    assert(decode(got) == decode(ref))
    // per-key limit binds: 10 keys x min(4, 6 in-range columns)
    assert(got.count() == 40)
  }

  test("keySlices over parquet is ONE scan with both ranges pushed") {
    val dir = java.nio.file.Files.createTempDirectory("kv_keyslices").toString
    try {
      kcv(for (k <- 1L to 50L; c <- 1L to 5L) yield (k, c, k + c))
        .write.mode("overwrite").parquet(dir)
      val store = spark.read.parquet(dir)
      val q = KVStore.keySlices(store,
        KVStore.encLong(F.lit(10L)), KVStore.encLong(F.lit(30L)),
        KVStore.encLong(F.lit(2L)), KVStore.encLong(F.lit(5L)), limit = 2)
      assert(q.count() == 20 * 2) // 20 keys, limit 2 of 3 in-range columns
      // execution first: AQE's final plan is what a cluster actually runs
      val exec = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scans = exec.collect { case s: FileSourceScanExec => s }
      assert(scans.size == 1,
        s"expected ONE parquet scan, got ${scans.size}:\n${q.queryExecution.executedPlan}")
      // metadata's PushedFilters string is display-truncated; the scan's
      // dataFilters are the authoritative pushed predicates
      val pushed = scans.head.dataFilters.map(_.sql).mkString("; ")
      assert(pushed.contains("k >=") && pushed.contains("k <") &&
        pushed.contains("c >=") && pushed.contains("c <"),
        s"expected k and c range predicates pushed to the scan, got: $pushed")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } finally walk.close()
    }
  }
}
