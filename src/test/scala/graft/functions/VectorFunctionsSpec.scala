package graft.functions

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {

  test("float_vec_dot matches the zip_with+aggregate fold bit-for-bit") {
    import spark.implicits._
    val df = graft.Tables(spark, SF, "embeddings").limit(200)
    val diff = df.select(
      VectorFunctions.floatVecDot(F.col("embedding"), F.col("embedding")).as("fast"),
      F.aggregate(
        F.zip_with(F.col("embedding"), F.col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
        F.lit(0.0), (acc, x) => acc + x).as("ref"))
      .filter(F.col("fast") =!= F.col("ref")).count()
    assert(diff == 0)
  }

  test("SQL registration via GraftExtensions.register") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "float_vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
  }

  test("float_mat_top_centroids ranks like per-centroid cosine, ties to smaller index") {
    val cents: Seq[Seq[Float]] = Seq(
      Seq(1.0f, 0.0f, 0.0f),
      Seq(0.0f, 1.0f, 0.0f),
      Seq(1.0f, 1.0f, 0.0f),
      Seq(2.0f, 0.0f, 0.0f)) // same direction as centroid 0 → cosine tie
    val df = graft.Tables(spark, SF, "embeddings").limit(100)
      .select(F.slice(F.col("embedding"), 1, 3).as("v"))
    // reference ranking: argmax over explicit cosines (first max wins)
    val rows = df.select(
      VectorFunctions.floatMatTopCentroids(F.col("v"), F.typedlit(cents), F.lit(2)).as("top"),
      F.array(cents.map(c => VectorFunctions.floatVecCosine(
        F.col("v"), F.typedlit(c))): _*).as("cs")).collect()
    rows.foreach { r =>
      val top = r.getSeq[Int](0)
      val cs = r.getSeq[Double](1)
      val expected = cs.zipWithIndex.sortBy { case (c, i) => (-c, i) }.take(2).map(_._2)
      assert(top == expected, s"got $top expected $expected for cs=$cs")
    }
    // deterministic tie via SQL: two colinear centroids tie on cosine,
    // so the smaller index must come first
    graft.GraftExtensions.register(spark)
    val tie = spark.sql(
      "SELECT float_mat_top_centroids(array(CAST(5.0 AS FLOAT), CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))), 2) AS t")
    assert(tie.head().getSeq[Int](0) == Seq(0, 1))
  }

  test("matrix expressions reject null and ragged constant matrices at analysis") {
    graft.GraftExtensions.register(spark)
    def fails(sql: String, fragment: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(fragment), s"message was: ${e.getMessage}")
    }
    val v = "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))"
    val f = "CAST(1.0 AS FLOAT)"
    // null row
    fails(s"SELECT float_mat_top_centroids($v, array(array($f, $f), CAST(NULL AS ARRAY<FLOAT>)), 1)",
      "null rows")
    // ragged rows
    fails(s"SELECT float_mat_top_centroids($v, array(array($f, $f), array($f)), 1)",
      "equal length")
    // null element inside a row
    fails(s"SELECT float_mat_sign_buckets($v, array(array($f, CAST(NULL AS FLOAT))), 1)",
      "null elements")
    // well-formed matrices still pass
    val ok = spark.sql(
      s"SELECT float_mat_top_centroids($v, array(array($f, $f), array($f, CAST(0.0 AS FLOAT))), 1) AS t")
    assert(ok.head().getSeq[Int](0).nonEmpty)
  }

  test("fused cosine agrees with dot/norm form") {
    val df = graft.Tables(spark, SF, "embeddings").limit(50)
      .select(F.col("embedding").as("e1"))
      .crossJoin(graft.Tables(spark, SF, "embeddings").limit(50)
        .select(F.col("embedding").as("e2")))
    val bad = df.select(
      VectorFunctions.floatVecCosine(F.col("e1"), F.col("e2")).as("fused"),
      (VectorFunctions.floatVecDot(F.col("e1"), F.col("e2")) /
        (F.sqrt(VectorFunctions.floatVecDot(F.col("e1"), F.col("e1"))) *
          F.sqrt(VectorFunctions.floatVecDot(F.col("e2"), F.col("e2"))))).as("ref"))
      .filter(F.abs(F.col("fused") - F.col("ref")) > 1e-12).count()
    assert(bad == 0)
  }
}
