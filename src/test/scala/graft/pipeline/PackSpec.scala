package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

class PackSpec extends SparkSpec {

  test("d_pack bins respect the capacity unless a single doc overflows it") {
    val out = PackQueries.dPack(spark, SF)
    val bins = out.groupBy("source", "bin")
      .agg(F.sum("n").as("fill"), F.count(F.lit(1)).as("ndocs"))
      .collect()
    assert(bins.nonEmpty)
    bins.foreach { r =>
      val fill = r.getAs[Long]("fill")
      val ndocs = r.getAs[Long]("ndocs")
      // an over-full bin is only legal for a single doc longer than cap
      assert(fill <= PackQueries.PackCap || ndocs == 1L,
        s"bin ${r} overflows with multiple docs")
    }
  }

  test("d_pack offsets tile each bin contiguously from 0") {
    val rows = PackQueries.dPack(spark, SF)
      .orderBy("source", "bin", "off").collect()
      .groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("bin")))
    rows.foreach { case (_, slots) =>
      var expect = 0L
      slots.foreach { r =>
        assert(r.getAs[Long]("off") == expect)
        expect += r.getAs[Long]("n")
      }
    }
  }

  test("d_pack layout is invariant to input partitioning") {
    val a = PackQueries.dPack(spark, SF).collect().toSet
    // same fold, different physical partitioning of the input scan
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      val b = PackQueries.dPack(spark, SF).collect().toSet
      assert(a == b)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
  }
}
