package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec
import graft.sources.kvconnector.KVScan

/** The adjacency-in-KCV composition (KVGraphQueries): a traversal hop
  * must equal the frame entry row-for-row AND actually exercise the kv
  * pruning stack — runtime key pruning from the start set, zone-map
  * pruning from the label slice. */
class KVGraphSpec extends SparkSpec {

  private def kvScans(df: DataFrame): Seq[BatchScanExec] =
    collectExec(df) { case b: BatchScanExec if b.scan.isInstanceOf[KVScan] => b }

  test("g_kv_onehop equals the frame one-hop and prunes the adjacency store") {
    val kv = KVGraphQueries.gKvOneHop(spark, SF)
    val frame = GraphQueries.gOneHop(spark, SF)
    assert(kv.columns.toSeq == frame.columns.toSeq)
    val a = kv.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val b = frame.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("the start-set join hands a runtime key filter to the adjacency scan") {
    // run the underlying join (pre-localCheckpoint plans are consumed by
    // the entry), re-built here with the same shape
    import org.apache.spark.sql.{functions => F}
    import graft.kv.KVStore.encLong
    val seg = java.nio.file.Files.createTempDirectory("graft_kvadjspec").toString
    val g = PropertyGraph(spark, SF)
    graft.sources.kvconnector.KVSegmentStore.write(
      g.edges.select(encLong(F.col("src")).as("k"),
        F.concat(encLong(F.lit(1L)), encLong(F.col("dst"))).as("c"),
        encLong(F.col("w")).as("v")),
      seg, 16)
    val start = g.vertices
      .filter(F.col("vlabel") === "customer" && F.col("mktsegment") === "BUILDING")
      .select(encLong(F.col("vid")).as("k"))
    val adj = spark.read.format("graft-kv").load(seg)
    val joined = adj.join(start, Seq("k"))
    joined.collect()
    val scans = kvScans(joined)
    assert(scans.size == 1)
    assert(scans.head.runtimeFilters.nonEmpty,
      "adjacency scan got no runtime key filter:\n" +
        joined.queryExecution.executedPlan)
    val total = graft.sources.kvconnector.KVSegmentStore.readManifest(seg).size
    val planned = scans.head.scan.asInstanceOf[KVScan].lastPlanned
    assert(planned >= 1 && planned <= total)
  }
}
