package graft.olap

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** The business-analytics batch (OlapBizQueries): the two-level Pareto
  * prefix sum must equal the naive global-window spelling exactly, the
  * funnel-time median must satisfy the discrete-median property, journeys
  * must be valid ≤3-step paths, and the Theil–Sen median must be an
  * actual pairwise slope. */
class BizSpec extends SparkSpec {

  test("q_pareto two-level prefix sum equals the naive global window") {
    val got = OlapBizQueries.qPareto(spark, SF).collect().head
    // naive: ONE global ordered window (the plan shape we refuse at scale)
    val rc = graft.Tables(spark, SF, "orders")
      .groupBy("o_custkey")
      .agg(F.sum((graft.Tables.dec2(F.col("o_totalprice")) * 100).cast("long")).as("rc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, v) => (-v, k) }
    val total = rc.map(_._2).sum
    val n = rc.size
    var cum = 0L
    var c50 = -1L; var c80 = -1L; var c90 = -1L
    var top1 = -1L; var top10 = -1L
    rc.zipWithIndex.foreach { case ((_, v), i) =>
      cum += v
      val rn = i + 1L
      if (c50 < 0 && cum * 100 >= total * 50) c50 = rn
      if (c80 < 0 && cum * 100 >= total * 80) c80 = rn
      if (c90 < 0 && cum * 100 >= total * 90) c90 = rn
      if (rn == (n + 99) / 100) top1 = cum * 1000000L / total
      if (rn == (n + 9) / 10) top10 = cum * 1000000L / total
    }
    assert(got.getLong(0) == n && got.getLong(1) == total)
    assert(got.getLong(2) == c50 && got.getLong(3) == c80 && got.getLong(4) == c90)
    assert(got.getLong(5) == top1 && got.getLong(6) == top10)
    assert(c50 <= c80 && c80 <= c90 && c90 <= n)
  }

  test("q_funnel_time median satisfies the discrete-median property") {
    val rows = OlapBizQueries.qFunnelTime(spark, SF).collect()
    assert(rows.nonEmpty)
    // recompute per-day conversion seconds the straightforward way
    val ev = graft.Tables(spark, SF, "events")
      .select(F.col("user_id"), F.col("event_type"), F.unix_micros(F.col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fv = ev.filter(_._2 == "view").groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val secs = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, us) => fv.get(u).filter(us >= _).map(f => (u, f, us)) }
      .groupBy(t => (t._1, t._2)).values
      .map { g => val f = g.head._2; (f / 86400000000L, (g.map(_._3).min - f) / 1000000L) }
      .toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val day = r.getLong(0)
      val xs = secs(day).toIndexedSeq
      assert(r.getLong(1) == xs.size)
      assert(r.getLong(2) == xs.min && r.getLong(3) == xs.max)
      assert(r.getLong(6) == xs((xs.size + 1) / 2 - 1), s"day $day lower median")
    }
  }

  test("q_journey emits valid ordered ≤3-step paths, top-20 by count") {
    val rows = OlapBizQueries.qJourney(spark, SF).collect()
    assert(rows.length == 20)
    val types = Set("view", "click", "purchase", "signup", "error")
    rows.foreach { r =>
      val segs = r.getString(0).split(">")
      assert(segs.nonEmpty && segs.length <= 3 && segs.forall(types))
    }
    // sorted by n_sess desc then path asc
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) > b.getLong(1) ||
          (a.getLong(1) == b.getLong(1) && a.getString(0) < b.getString(0)))
      case _ => ()
    }
  }

  test("q_basket_pairs equals brute-force per-order pair counts") {
    val items = graft.Tables(spark, SF, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val counts = items.groupBy(_._1).values.flatMap { order =>
      val ps = order.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expTop = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.take(20)
    val got = OlapBizQueries.qBasketPairs(spark, SF).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toSeq
    assert(got == expTop)
  }

  test("q_basket_lift confidence and lift recompute from brute-force counts") {
    val items = graft.Tables(spark, SF, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrd = items.map(_._1).distinct.length.toLong
    val perPart = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCounts = items.groupBy(_._1).values.flatMap { order =>
      val ps = order.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = OlapBizQueries.qBasketLift(spark, SF).collect()
    assert(got.length == 20)
    got.foreach { r =>
      val (p1, p2) = (r.getLong(0), r.getLong(1))
      val n12 = pairCounts((p1, p2))
      assert(r.getLong(2) == n12)
      assert(r.getLong(3) == perPart(p1) && r.getLong(4) == perPart(p2))
      assert(r.getLong(5) == 1000000L * n12 / perPart(p1))
      assert(r.getLong(6) == n12 * nOrd * 1000000L / (perPart(p1) * perPart(p2)))
    }
  }

  test("q_time_matrix covers every event once within the 7x24 grid") {
    val rows = OlapBizQueries.qTimeMatrix(spark, SF).collect()
    val nEvents = graft.Tables(spark, SF, "events").count()
    assert(rows.map(_.getLong(2)).sum == nEvents)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 7 && r.getLong(1) >= 0 && r.getLong(1) < 24)
      assert(r.getLong(3) >= 1 && r.getLong(3) <= r.getLong(2)) // users ≤ events
    }
  }

  test("q_audience_overlap is the exact Jaccard over per-type user sets") {
    val ut = graft.Tables(spark, SF, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val sets = ut.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val rows = OlapBizQueries.qAudienceOverlap(spark, SF).collect()
    val types = sets.keys.toSeq.sorted
    assert(rows.length == types.size * (types.size - 1) / 2)
    rows.foreach { r =>
      val (a, b) = (sets(r.getString(0)), sets(r.getString(1)))
      val n12 = (a intersect b).size.toLong
      assert(r.getLong(2) == n12 && r.getLong(3) == a.size && r.getLong(4) == b.size)
      assert(r.getLong(5) == 1000000L * n12 / (a.size + b.size - n12))
    }
  }

  test("q_discount_lift baseline row reads exactly 1e6 ppm") {
    val rows = OlapBizQueries.qDiscountLift(spark, SF).collect()
    val base = rows.find(_.getLong(0) == 0L).get
    assert(base.getLong(4) == 1000000L)
    val totalN = graft.Tables(spark, SF, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == totalN, "every lineitem in one bucket")
    rows.foreach { r =>
      assert(r.getLong(3) == 100L * r.getLong(2) / r.getLong(1))
      assert(r.getLong(4) == 1000000L * r.getLong(3) / base.getLong(3))
    }
  }

  test("q_repeat_rate ppm is the exact floor share of repeat purchasers") {
    val rows = OlapBizQueries.qRepeatRate(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == 1000000L * r.getLong(2) / r.getLong(1))
    }
  }

  test("q_prop_ztest matches the recomputed z on interior proportions") {
    val r = OlapBizQueries.qPropZtest(spark, SF).collect().head
    val (n1, x1, n2, x2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // recompute cohorts from events
    val np = graft.Tables(spark, SF, "events")
      .groupBy("user_id")
      .agg(F.sum(F.when(F.col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    val tot = np.map(_._2).sum
    val nu = np.length
    val conv = np.map { case (u, c) => (u % 2, if (c * nu > tot) 1L else 0L) }
    assert(n1 == conv.count(_._1 == 0) && x1 == conv.filter(_._1 == 0).map(_._2).sum)
    assert(n2 == conv.count(_._1 == 1) && x2 == conv.filter(_._1 == 1).map(_._2).sum)
    // interior proportions: the construction guarantees 0 < p < 1 pooled
    assert(x1 + x2 > 0 && x1 + x2 < n1 + n2)
    assert(r.getLong(4) == 1000000L * x1 / n1 && r.getLong(5) == 1000000L * x2 / n2)
    val p1 = x1.toDouble / n1; val p2 = x2.toDouble / n2
    val p = (x1 + x2).toDouble / (n1 + n2)
    val z = (p1 - p2) / math.sqrt(p * (1 - p) * (1.0 / n1 + 1.0 / n2))
    assert(r.getLong(6) == math.floor(z * 1e6).toLong)
  }

  test("q_period_detect picks the argmax autocorrelation lag") {
    val daily = graft.Tables(spark, SF, "events")
      .groupBy(F.col("event_type"), F.expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(F.sum((graft.Tables.dec2(F.col("value")) * 100).cast("long")).as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val rows = OlapBizQueries.qPeriodDetect(spark, SF).collect()
    assert(rows.length == daily.size)
    rows.foreach { r =>
      val series = daily(r.getString(0)).map(t => (t._2, t._3)).toMap
      val mu = series.values.sum / series.size
      val cent = series.view.mapValues(v => (v - mu) / 1000).toMap
      val scored = (1L to 14L).flatMap { lag =>
        val pairs = cent.keys.toSeq.flatMap(d => cent.get(d + lag).map(ck => cent(d) * ck))
        if (pairs.isEmpty) None
        else Some((lag, pairs.sum * 1000 / pairs.size, pairs.size.toLong))
      }
      val best = scored.minBy { case (lag, sc, _) => (-sc, lag) }
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == best, r.getString(0))
    }
  }

  test("q_ltv_curve cumulative is monotone and matches the flat recompute") {
    val rows = OlapBizQueries.qLtvCurve(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val p = graft.Tables(spark, SF, "events")
      .filter(F.col("event_type") === "purchase")
      .select(F.col("user_id"), F.expr("unix_micros(ts) div 604800000000").as("week"),
        (graft.Tables.dec2(F.col("value")) * 100).cast("long").as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohort = p.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val byCA = p.groupBy(t => (cohort(t._1), t._2 - cohort(t._1))).view.mapValues(_.map(_._3).sum).toMap
    val cohortN = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.groupBy(_._1).foreach { case (c, ages) =>
      val sortedAges = ages.sortBy(_._2)
      var cum = 0L
      sortedAges.foreach { a =>
        assert(a._3 == byCA((c, a._2)), s"cohort $c age ${a._2} rev")
        cum += a._3
        assert(a._4 == cum && a._5 == cohortN(c))
        assert(a._6 == 100L * cum / cohortN(c))
      }
    }
  }

  test("q_purchase_gap median satisfies the discrete-median property") {
    val r = OlapBizQueries.qPurchaseGap(spark, SF).collect().head
    val p = graft.Tables(spark, SF, "events")
      .filter(F.col("event_type") === "purchase")
      .select(F.col("user_id"), F.col("event_id"), F.unix_micros(F.col("ts")).as("us"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val gaps = p.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._3, e._2))
      s.sliding(2).collect { case Array(a, b) => (b._3 - a._3) / 1000000L }
    }.toSeq.sorted
    assert(r.getLong(0) == gaps.size)
    assert(r.getLong(1) == gaps.min && r.getLong(2) == gaps.max)
    assert(r.getLong(3) == 100L * gaps.sum / gaps.size)
    assert(r.getLong(4) == gaps((gaps.size + 1) / 2 - 1))
  }

  test("q_theil_sen median is an actual pairwise slope with full pair count") {
    val daily = graft.Tables(spark, SF, "events")
      .groupBy(F.col("event_type"), F.expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(F.sum((graft.Tables.dec2(F.col("value")) * 100).cast("long")).as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val rows = OlapBizQueries.qTheilSen(spark, SF).collect()
    assert(rows.length == daily.size)
    rows.foreach { r =>
      val series = daily(r.getString(0)).sortBy(_._2)
      val n = series.size
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == n.toLong * (n - 1) / 2)
      val slopes = (for {
        i <- series.indices; j <- (i + 1) until n
      } yield {
        val num = (series(j)._3 - series(i)._3) * 1000000L
        val den = series(j)._2 - series(i)._2
        num / den // both operands: / on Long truncates toward zero, same as div
      }).sorted
      assert(r.getLong(3) == slopes((slopes.size + 1) / 2 - 1), s"${r.getString(0)} median slope")
    }
  }
}
