package graft.sources.kvconnector

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.kv.KVStore

/** Storage-partitioned join through the graft-kv connector (r11 verdict
  * #5): two stores bucketed by the same hash of k must equi-join on k
  * with ZERO shuffle Exchange on either side — kv_bucket_join's
  * co-location property, native to the DSv2 path instead of parquet
  * bucket tables. */
class KVSpjSpec extends SparkSpec {

  private def withSpjConf[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.graftkv", classOf[KVCatalog].getName)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    body
  }

  private def cellsDf = {
    spark.range(0, 2000)
      .select(
        KVStore.encLong(F.col("id") % 100).as("k"),
        KVStore.encLong(F.col("id")).as("c"),
        F.concat(F.lit("v"), F.col("id").cast("string")).cast("binary").as("v"))
  }

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeLike] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeLike] =
      p.collect {
        case e: ShuffleExchangeLike => Seq(e)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      }.flatten
    walk(df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    })
  }

  test("two same-bucketed stores join on k with zero shuffle Exchange") {
    withSpjConf {
      val cellsDir = Files.createTempDirectory("graft_spjc").toString
      val rollDir = Files.createTempDirectory("graft_spjr").toString
      KVSegmentStore.writeBucketed(cellsDf, cellsDir, numBuckets = 8)
      val roll = cellsDf.groupBy("k").agg(F.count(F.lit(1)).as("n"))
        .select(F.col("k"), KVStore.encLong(F.lit(0L)).as("c"),
          KVStore.encLong(F.col("n")).as("v"))
      KVSegmentStore.writeBucketed(roll, rollDir, numBuckets = 8)

      val cells = spark.table(s"graftkv.`$cellsDir`")
      val totals = spark.table(s"graftkv.`$rollDir`")
        .select(F.col("k"), F.col("v").as("tot"))
      val joined = cells.hint("merge").join(totals, Seq("k"))
      val rows = joined.collect()
      assert(rows.length == 2000, s"join rows: ${rows.length}")
      assert(shuffles(joined).isEmpty,
        "expected a storage-partitioned (zero-Exchange) join, got:\n" +
          joined.queryExecution.executedPlan)
      // the scans REPORT the (k, c) per-partition write order
      // (one segment per bucket), so the merge join needs no SortExec
      // on either side — co-located AND pre-sorted
      def sorts(p: org.apache.spark.sql.execution.SparkPlan): Seq[Any] =
        p.collect {
          case s: org.apache.spark.sql.execution.SortExec => Seq(s)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => sorts(q.plan)
          case a: AdaptiveSparkPlanExec => sorts(a.executedPlan)
        }.flatten
      val found = sorts(joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      })
      assert(found.isEmpty,
        "expected sort-free SPJ (reported ordering), got:\n" +
          joined.queryExecution.executedPlan)
    }
  }

  test("bucket ids on disk match the declared bucket function") {
    withSpjConf {
      val dir = Files.createTempDirectory("graft_spjb").toString
      KVSegmentStore.writeBucketed(cellsDf, dir, numBuckets = 8)
      assert(KVSegmentStore.readBuckets(dir).contains(8))
      // sortedness marker survives: TopN read-in-order still applies
      assert(KVSegmentStore.readSortedKC(dir))
      val segs = KVSegmentStore.readManifest(dir)
      assert(segs.nonEmpty && segs.size <= 8)
      segs.foreach { seg =>
        val id = KVSegmentStore.bucketId(seg.file)
        assert(0 <= id && id < 8)
        val keys = spark.read.parquet(seg.file).select("k").collect()
          .map(_.getAs[Array[Byte]](0))
        assert(keys.nonEmpty)
        keys.foreach { k =>
          assert(KVBucketFunction.bucketOf(k, 8) == id,
            s"key ${KVSegmentStore.hex(k)} in segment of bucket $id " +
              s"hashes to ${KVBucketFunction.bucketOf(k, 8)}")
        }
      }
      // the V2 ScalarFunction agrees with the raw hash
      val bound = KVBucketFunction.bind(new org.apache.spark.sql.types.StructType()
        .add("n", org.apache.spark.sql.types.IntegerType)
        .add("k", org.apache.spark.sql.types.BinaryType))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
      val k0 = KVStore.encLong(F.lit(7L))
      val bytes = spark.range(1).select(k0.as("k")).head().getAs[Array[Byte]](0)
      val viaFn = bound.produceResult(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](8, bytes)))
      assert(viaFn == KVBucketFunction.bucketOf(bytes, 8))
    }
  }

  test("a range/zorder store reports no bucket layout and still reads") {
    withSpjConf {
      val dir = Files.createTempDirectory("graft_spjl").toString
      KVSegmentStore.write(cellsDf, dir, numSegments = 8)
      assert(KVSegmentStore.readBuckets(dir).isEmpty)
      // joining two RANGE stores through the connector still shuffles —
      // the property being native-to-bucketed, not universal
      assert(spark.read.format("graft-kv").load(dir).count() == 2000)
    }
  }

  test("a linear append DEMOTES the bucket marker instead of breaking reads") {
    withSpjConf {
      val dir = Files.createTempDirectory("graft_spja").toString
      KVSegmentStore.writeBucketed(cellsDf, dir, numBuckets = 8)
      assert(KVSegmentStore.readBuckets(dir).contains(8))
      // an ordinary connector append has no __b= directory — the bucket
      // invariant no longer holds, so the marker must fall (r12 review:
      // a stale marker made every subsequent scan throw on bucketId)
      val extra = spark.range(2000, 2100)
        .select(
          KVStore.encLong(F.col("id") % 100).as("k"),
          KVStore.encLong(F.col("id")).as("c"),
          F.lit("x").cast("binary").as("v"))
      extra.write.format("graft-kv").option("segments", 2)
        .mode("append").save(dir)
      assert(KVSegmentStore.readBuckets(dir).isEmpty,
        "bucket marker must be demoted by a linear append")
      // reads keep working over the mixed store, TopN push included
      assert(spark.read.format("graft-kv").load(dir).count() == 2100)
      assert(KVSegmentStore.readSortedKC(dir))
      val top = spark.read.format("graft-kv").load(dir)
        .orderBy(F.col("k").asc, F.col("c").asc).limit(5).collect()
      assert(top.length == 5)
    }
  }

  test("static key pruning composes with the bucket layout") {
    withSpjConf {
      val dir = Files.createTempDirectory("graft_spjp").toString
      KVSegmentStore.writeBucketed(cellsDf, dir, numBuckets = 8)
      // a point probe keeps only the segments whose bloom/bounds can
      // hold the key — on a hash layout that is bloom work, and at most
      // a couple of buckets survive
      val probe = spark.table(s"graftkv.`$dir`")
        .filter(F.col("k") === KVStore.encLong(F.lit(42L)))
      assert(probe.count() == 20)
    }
  }
}
