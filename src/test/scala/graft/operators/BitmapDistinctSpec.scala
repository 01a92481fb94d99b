package graft.operators

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

class BitmapDistinctSpec extends SparkSpec {
  import BitmapDistinct._

  // deterministic skewed ids: many repeats, some sparse high ids
  private def ids(parts: Int) = {
    import spark.implicits._
    spark.range(0, 5000, 1, parts)
      .select((F.col("id") % 7).as("g"),
        F.when(F.col("id") % 11 === 0, F.col("id") * 1000000L)
          .otherwise(F.col("id") % 400).as("uid"))
  }

  test("bitmap cardinality equals exact countDistinct, at any partitioning") {
    val expected = ids(1).groupBy("g").agg(F.countDistinct("uid").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = ids(parts).groupBy("g").agg(cardinality(buildAgg(F.col("uid"))).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("and-cardinality equals the exact set intersection size") {
    val df = ids(8)
    val bms = df.groupBy("g").agg(buildAgg(F.col("uid")).as("bm"))
    val a = bms.filter(F.col("g") === 0).select(F.col("bm").as("ba"))
    val b = bms.filter(F.col("g") === 1).select(F.col("bm").as("bb"))
    val got = a.crossJoin(b)
      .select(andCardinality(F.col("ba"), F.col("bb")).as("n"))
      .collect().head.getLong(0)
    val ex = df.filter(F.col("g") === 0).select("uid")
      .intersect(df.filter(F.col("g") === 1).select("uid")).count()
    assert(got == ex)
    assert(got > 0)
  }

  test("andnot/xor cardinalities equal the exact set algebra, and compose") {
    val df = ids(8)
    val bms = df.groupBy("g").agg(buildAgg(F.col("uid")).as("bm"))
    val a = bms.filter(F.col("g") === 0).select(F.col("bm").as("ba"))
    val b = bms.filter(F.col("g") === 1).select(F.col("bm").as("bb"))
    val row = a.crossJoin(b).select(
      cardinality(F.col("ba")).as("na"),
      cardinality(F.col("bb")).as("nb"),
      andCardinality(F.col("ba"), F.col("bb")).as("nand"),
      andNotCardinality(F.col("ba"), F.col("bb")).as("nanot"),
      andNotCardinality(F.col("bb"), F.col("ba")).as("nbnot"),
      xorCardinality(F.col("ba"), F.col("bb")).as("nxor"))
      .collect().head
    val sa = df.filter(F.col("g") === 0).select("uid").distinct()
      .collect().map(_.getLong(0)).toSet
    val sb = df.filter(F.col("g") === 1).select("uid").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(row.getAs[Long]("nanot") == (sa diff sb).size)
    assert(row.getAs[Long]("nbnot") == (sb diff sa).size)
    assert(row.getAs[Long]("nxor") == ((sa diff sb) union (sb diff sa)).size)
    // algebraic identities tie the five cardinalities together
    assert(row.getAs[Long]("nanot") == row.getAs[Long]("na") - row.getAs[Long]("nand"))
    assert(row.getAs[Long]("nxor") ==
      row.getAs[Long]("na") + row.getAs[Long]("nb") - 2 * row.getAs[Long]("nand"))
    // SQL registration path
    graft.GraftExtensions.register(spark)
    a.crossJoin(b).createOrReplaceTempView("bm_pair")
    val sqlRow = spark.sql(
      """SELECT bitmap_andnot_cardinality(ba, bb) AS x,
        |       bitmap_xor_cardinality(ba, bb) AS y FROM bm_pair""".stripMargin)
      .collect().head
    assert(sqlRow.getLong(0) == row.getAs[Long]("nanot"))
    assert(sqlRow.getLong(1) == row.getAs[Long]("nxor"))
  }

  test("merging per-subgroup states equals aggregating the raw rows") {
    val df = ids(8).withColumn("sub", F.col("uid") % 3)
    val direct = df.groupBy("g").agg(cardinality(buildAgg(F.col("uid"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = df.groupBy("g", "sub").agg(buildAgg(F.col("uid")).as("bm"))
      .groupBy("g").agg(cardinality(orAgg(F.col("bm"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == direct)
  }

  test("the aggregates work from SQL via GraftExtensions registration") {
    graft.GraftExtensions.register(spark)
    ids(8).createOrReplaceTempView("bm_ids")
    val viaSql = spark.sql(
      """SELECT g, bitmap_cardinality(bitmap_build(uid)) AS n, uniq_up_to(uid, 3) AS u
        |FROM bm_ids GROUP BY g""".stripMargin)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = ids(1).groupBy("g")
      .agg(F.countDistinct("uid").as("n")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), math.min(r.getLong(1), 4L))).toMap
    assert(viaSql == expected)
  }

  test("partial aggregation is active (map-side bitmaps, not raw rows)") {
    val plan = ids(8).groupBy("g").agg(buildAgg(F.col("uid")).as("bm"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_bitmap_build"), plan)
  }
}
