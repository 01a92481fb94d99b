package graft.olap

import org.apache.spark.sql.{functions => F}

import graft.{SparkSpec, Tables}

class OlapAnalyticSpec extends SparkSpec {

  test("skew6/kurt6 agree with Spark's built-in skewness/kurtosis to 1e-5") {
    val builtin = Tables(spark, SF, "lineitem")
      .groupBy("l_returnflag")
      .agg(F.skewness(F.col("l_quantity")).as("sk"), F.kurtosis(F.col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val got = OlapAnalyticQueries.qSkewKurt(spark, SF).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (sk, ku) = builtin(r.getString(0))
      assert(math.abs(r.getLong(2) / 1e6 - sk) < 1e-5, s"skew ${r.getString(0)}")
      // Spark's kurtosis is EXCESS kurtosis; kurt6 is the raw m4/m2^2.
      assert(math.abs(r.getLong(3) / 1e6 - (ku + 3.0)) < 1e-5, s"kurt ${r.getString(0)}")
    }
  }

  test("linreg matches a driver-side least-squares fit") {
    val rows = Tables(spark, SF, "orders")
      .select(F.col("o_orderpriority"),
        F.expr("datediff(cast(o_orderdate as date), date'1970-01-01')").cast("long"),
        (Tables.dec2(F.col("o_totalprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = OlapAnalyticQueries.qLinreg(spark, SF).collect()
    got.foreach { r =>
      val pts = rows.filter(_._1 == r.getString(0)).map(p => (p._2.toDouble, p._3.toDouble))
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getLong(2) / 1e6 - slope) < 1e-3, s"slope ${r.getString(0)}")
      val icept = (sy - slope * sx) / n
      assert(math.abs(r.getLong(3) - icept) < 2.0, s"icept ${r.getString(0)}")
    }
  }

  test("Mann-Whitney U equals the brute-force pairwise count with half-ties") {
    val ev = Tables(spark, SF, "events")
      .filter(F.col("event_type").isin("click", "purchase"))
      .select(F.expr("unix_micros(ts) div 86400000000 % 7").as("g"),
        F.col("event_type"), (Tables.dec2(F.col("value")) * 100).cast("long").as("vc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val got = OlapAnalyticQueries.qMwuAuc(spark, SF).collect()
    assert(got.length == 7)
    got.foreach { r =>
      val g = r.getLong(0)
      val a = ev.filter(e => e._1 == g && e._2 == "click").map(_._3)
      val b = ev.filter(e => e._1 == g && e._2 == "purchase").map(_._3)
      // 2·U = 2·#(a>b) + #(a==b), exactly the midrank convention.
      val u2 = a.map(x => 2L * b.count(x > _) + b.count(x == _)).sum
      assert(r.getLong(3) == u2, s"group $g: u2 ${r.getLong(3)} vs brute $u2")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("weighted median halves the total weight on each side") {
    val data = Tables(spark, SF, "lineitem")
      .select(F.col("l_returnflag"),
        (Tables.dec2(F.col("l_extendedprice")) * 100).cast("long").as("vc"),
        F.col("l_quantity").cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    OlapAnalyticQueries.qWMedian(spark, SF).collect().foreach { r =>
      val (g, med) = (r.getString(0), r.getLong(2))
      val grp = data.filter(_._1 == g)
      val tot = grp.map(_._3).sum
      val below = grp.filter(_._2 < med).map(_._3).sum
      val upTo = grp.filter(_._2 <= med).map(_._3).sum
      assert(2 * below < tot, s"$g: too much weight strictly below the median")
      assert(2 * upTo >= tot, s"$g: median does not reach half the weight")
      assert(r.getLong(1) == tot)
    }
  }

  test("boundingRatio reproduces a driver-side first/last slope") {
    val got = OlapAnalyticQueries.qBoundingRatio(spark, SF).collect()
    assert(got.nonEmpty)
    val uid = got.head.get(0)
    val pts = Tables(spark, SF, "events").filter(F.col("user_id") === uid)
      .select(F.unix_micros(F.col("ts")), F.col("event_id"),
        (Tables.dec2(F.col("value")) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(p => (p._1, p._2))
    val expect = (pts.last._3 - pts.head._3) * 1000000L / (pts.last._1 - pts.head._1).toDouble
    val gotV = got.find(_.get(0) == uid).get.getDouble(2)
    assert(math.abs(gotV - expect) < 1e-9, s"user $uid: $gotV vs $expect")
  }

  test("maxIntersections equals a driver-side sweep for every user") {
    val iv = Tables(spark, SF, "events")
      .select(F.col("user_id"), F.expr("unix_micros(ts) div 1000000").as("st"), F.col("event_id"))
      .collect().map(r => (r.get(0), r.getLong(1), r.getLong(1) + 60L + r.getLong(2) % 600L))
    val byUser = iv.groupBy(_._1)
    OlapAnalyticQueries.qMaxIntersections(spark, SF).collect().foreach { r =>
      val pts = byUser(r.get(0)).flatMap { case (_, s, e) => Seq((s, 1L), (e, -1L)) }
        .sortBy(identity)
      var run = 0L; var mx = Long.MinValue; var pos = 0L
      pts.foreach { case (t, d) => run += d; if (run > mx) { mx = run; pos = t } }
      assert(r.getLong(1) == mx, s"user ${r.get(0)}: stack")
      assert(r.getLong(2) == pos, s"user ${r.get(0)}: position")
    }
  }

  test("bit aggregates match a driver-side fold") {
    val ids = Tables(spark, SF, "events").select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    OlapAnalyticQueries.qBitops(spark, SF).collect().foreach { r =>
      val xs = ids.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getLong(2) == xs.reduce(_ & _))
      assert(r.getLong(3) == xs.reduce(_ | _))
      assert(r.getLong(4) == xs.reduce(_ ^ _))
    }
  }
}
