package graft.sources.kvconnector

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.kv.KVStore

/** The z-order segment layout: same rows as the linear layout (placement
  * never changes content), a rectangle probe schedules strictly fewer
  * segments, ordered reads ride the TopN push on (k, c)-sorted curve
  * runs (r10 verdict #6), and linear stores keep the marker-less
  * default. */
class KVZOrderSpec extends SparkSpec {

  // 64 keys × 32 qualifiers, both uniform — a clean 2-D grid
  private def grid = {
    import spark.implicits._
    spark.range(0, 2048)
      .select(
        KVStore.encLong(F.col("id") % 64).as("k"),
        KVStore.encLong(F.col("id") / 64).as("c"),
        F.concat(F.lit("v"), F.col("id").cast("string")).cast("binary").as("v"),
        (F.col("id") % 64).as("zka"),
        (F.col("id") / 64).as("zca"))
  }

  private def beLong(v: Long): Array[Byte] = KVStore.beLong(v)

  private def writeBoth(): (String, String) = {
    val lin = Files.createTempDirectory("graft_zspec_lin").toString
    val zo = Files.createTempDirectory("graft_zspec_zo").toString
    grid.select("k", "c", "v").write.format("graft-kv")
      .option("segments", 16).mode("overwrite").save(lin)
    KVZOrder.write(grid, F.col("zka"), F.col("zca"), zo, 16)
    (lin, zo)
  }

  test("zorder schedules strictly fewer segments on a rectangle probe") {
    val (lin, zo) = writeBoth()
    // bottom half of keys × one-eighth of qualifiers
    val nLin = KVZOrder.scheduledSegments(lin,
      beLong(0), beLong(31), beLong(0), beLong(4))
    val nZo = KVZOrder.scheduledSegments(zo,
      beLong(0), beLong(31), beLong(0), beLong(4))
    info(s"scheduled: linear=$nLin zorder=$nZo of 16")
    assert(nZo < nLin, s"zorder $nZo !< linear $nLin")
    // and both layouts return the same probe rows
    def rows(dir: String) =
      spark.read.format("graft-kv").load(dir)
        .filter(F.col("k") >= F.lit(beLong(0)) && F.col("k") <= F.lit(beLong(31)) &&
          F.col("c") >= F.lit(beLong(0)) && F.col("c") < F.lit(beLong(4)))
        .collect().map(r => (r.getAs[Array[Byte]](0).toSeq,
          r.getAs[Array[Byte]](1).toSeq, r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(rows(zo) == rows(lin))
    assert(rows(zo).size == 32 * 4)
  }

  test("zorder serves the TopN push from (k,c)-sorted curve runs") {
    val (lin, zo) = writeBoth()
    assert(KVSegmentStore.readLayout(lin) == "linear")
    assert(KVSegmentStore.readLayout(zo) == "zorder")
    def top(dir: String) =
      spark.read.format("graft-kv").load(dir)
        .orderBy(F.col("k").asc, F.col("c").asc).limit(20)
        .collect().map(r => (r.getAs[Array[Byte]](0).toSeq,
          r.getAs[Array[Byte]](1).toSeq)).toSeq
    // the zorder store must return the true (k, c)-smallest rows:
    // segment MEMBERSHIP follows the curve, but rows inside every
    // segment are (k, c)-sorted by the write contract, so per-segment
    // prefixes + Spark's merge serve the order (r10 verdict #6)
    assert(top(zo) == top(lin))
    // the push is ACCEPTED and each reader stops at the limit: the scan
    // decodes at most limit rows per scheduled segment, never the store
    val q = spark.read.format("graft-kv").load(zo)
      .orderBy(F.col("k").asc, F.col("c").asc).limit(20)
    q.collect()
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[KVScan] => b
    }.get
    assert(scan.scan.description().contains("limit=20"),
      scan.scan.description())
    val decoded = scan.metrics("numOutputRows").value
    assert(decoded <= 16L * 20, s"decoded $decoded rows — limit not pushed")
    assert(decoded < 2048, "scan decoded the whole store")
  }

  test("truncating a zorder store with a linear write clears the marker") {
    val (_, zo) = writeBoth()
    grid.select("k", "c", "v").write.format("graft-kv")
      .option("segments", 8).mode("overwrite").save(zo)
    assert(KVSegmentStore.readLayout(zo) == "linear")
  }
}
