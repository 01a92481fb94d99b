package graft.operators

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

class UniqUpToSpec extends SparkSpec {

  private def df(parts: Int) = {
    import spark.implicits._
    // group g has g*10 distinct ids (g = 1..6), each repeated 3 times
    (1 to 6).flatMap { g =>
      (0 until g * 10).flatMap(i => Seq.fill(3)((g.toLong, (g * 1000 + i).toLong)))
    }.toDF("g", "uid").repartition(parts)
  }

  test("exact below the cap, n+1 above it, at any partitioning") {
    for (parts <- Seq(1, 5, 32)) {
      val got = df(parts).groupBy("g")
        .agg(UniqUpTo.agg(F.col("uid"), 30).as("u"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = (1 to 6).map(g => g.toLong -> math.min(g * 10, 31).toLong).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("state is bounded by n+1, not by the distinct count") {
    val agg = UniqUpToAgg(org.apache.spark.sql.graftbridge.GraftSqlBridge
      .expression(F.col("x")), n = 10)
    val buf = agg.createAggregationBuffer()
    val big = scala.collection.mutable.HashSet((0L until 1000L): _*)
    val merged = agg.merge(buf, big)
    assert(merged.size == 11) // n+1, not 1000
    assert(agg.eval(merged) == 11L)
  }
}
