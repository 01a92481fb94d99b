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
