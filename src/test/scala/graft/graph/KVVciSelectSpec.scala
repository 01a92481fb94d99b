package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.kv.KVStore.decLong
import graft.sources.kvconnector.{KVScan, KVSegmentStore}

/** VCI index SELECTION (r12 verdict #7): one (vertex, label) adjacency
  * carrying both the dst-sorted primary family and the w-sorted VCI
  * family, with [[KVGraphQueries.edgeSlice]] as the choice rule —
  * JanusGraph's buildEdgeIndex picks the sort order matching the
  * predicate the same way. */
class KVVciSelectSpec extends SparkSpec {

  // sf0.01: peer edges exist there (sf0.001 has none)
  private val sf01 = "/root/testdata/sf0.01"

  private lazy val seg = {
    val d = java.nio.file.Files.createTempDirectory("graft_vcisel").toString
    KVSegmentStore.write(KVGraphQueries.dualAdjacency(spark, sf01), d, 16)
    d
  }
  private def store = spark.read.format("graft-kv").load(seg)

  private def kvScan(df: DataFrame): KVScan =
    collectExec(df) {
      case b: BatchScanExec if b.scan.isInstanceOf[KVScan] =>
        b.scan.asInstanceOf[KVScan]
    }.head

  test("a weight bound routes to the w-sorted VCI family and zone-prunes") {
    val picked = KVGraphQueries.edgeSlice(store, "peer", Some(2L))
    val rows = picked.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val frame = GraphQueries.gDslEdgeW(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(rows.nonEmpty && rows == frame,
      s"vci route ${rows.size} rows vs frame ${frame.size}")
    assert(rows.forall(_._3 <= 2L))
    val scan = kvScan(picked)
    val total = KVSegmentStore.readManifest(seg).size
    assert(scan.lastPlanned < total,
      s"weight slice zone-pruned nothing: ${scan.lastPlanned}/$total")
  }

  test("a plain hop routes to the dst-sorted primary family") {
    val picked = KVGraphQueries.edgeSlice(store, "in_nation", None)
    val n = picked.count()
    val expected = PropertyGraph(spark, sf01).edges
      .filter(F.col("elabel") === "in_nation").count()
    // exact row-count equality proves family isolation: the VCI family
    // holds the same edges again, so reading both would double the count
    assert(n == expected, s"primary route read $n rows, expected $expected")
    // and the decode agrees with the frame's (src, dst, w)
    val a = picked.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = PropertyGraph(spark, sf01).edges
      .filter(F.col("elabel") === "in_nation")
      .select(F.col("src"), F.col("dst"), F.col("w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a == b)
  }

  test("the two families partition the qualifier space (no cell in both)") {
    val lo1 = KVGraphQueries.labelLo(KVGraphQueries.VciBase)
    val primary = store.filter(F.col("c") < lo1).count()
    val vci = store.filter(F.col("c") >= lo1).count()
    val edges = PropertyGraph(spark, sf01).edges.count()
    assert(primary == edges && vci == edges,
      s"primary=$primary vci=$vci edges=$edges")
  }
}
