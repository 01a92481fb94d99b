package graft.olap

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

class OlapExtraSpec extends SparkSpec {

  test("approx percentiles land within 2% of the exact ones") {
    val exact = OlapQueries.qPercentile(spark, SF).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val approx = OlapExtraQueries.qApproxPct(spark, SF).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, (a50, a90)) =>
      val (e50, e90) = exact(flag)
      assert(math.abs(a50 - e50) / e50 <= 0.02, s"$flag p50: approx $a50 vs exact $e50")
      assert(math.abs(a90 - e90) / e90 <= 0.02, s"$flag p90: approx $a90 vs exact $e90")
    }
  }

  test("cube emits all four grouping sets") {
    val rows = OlapExtraQueries.qCube(spark, SF)
      .select(F.col("l_returnflag").isNull.as("a"), F.col("l_linestatus").isNull.as("b"))
      .distinct().collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSet
    assert(rows == Set((false, false), (false, true), (true, false), (true, true)))
  }
}
