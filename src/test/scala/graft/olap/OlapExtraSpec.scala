package graft.olap

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

class OlapExtraSpec extends SparkSpec {

  test("approx percentiles pass rank feasibility in every cell") {
    val rows = OlapExtraQueries.qApproxPct(spark, SF).collect()
    assert(rows.nonEmpty)
    // every (flag, status) cell present, exact counts positive, both
    // GK rank-feasibility gates green
    val cells = graft.Tables(spark, SF, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct().count()
    assert(rows.length.toLong == cells)
    rows.foreach { r =>
      assert(r.getLong(2) > 0L, s"${r.getString(0)}/${r.getString(1)} n")
      assert(r.getLong(3) == 1L, s"${r.getString(0)}/${r.getString(1)} ok50")
      assert(r.getLong(4) == 1L, s"${r.getString(0)}/${r.getString(1)} ok90")
    }
  }

  test("cube emits all four grouping sets") {
    val rows = OlapExtraQueries.qCube(spark, SF)
      .select(F.col("l_returnflag").isNull.as("a"), F.col("l_linestatus").isNull.as("b"))
      .distinct().collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSet
    assert(rows == Set((false, false), (false, true), (true, false), (true, true)))
  }
}
