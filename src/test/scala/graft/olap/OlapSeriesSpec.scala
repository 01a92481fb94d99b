package graft.olap

import org.apache.spark.sql.{functions => F}

import graft.{SparkSpec, Tables}

class OlapSeriesSpec extends SparkSpec {

  test("deltaSum of a per-user sequence is bounded by total positive variation and exact on a monotone user") {
    val rows = OlapSeriesQueries.qDeltaSum(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L, s"user ${r.get(0)}: delta_sum must be non-negative")
    }
    // Independent recomputation for one user via a driver-side fold.
    val uid = rows.head.get(0)
    val vs = Tables(spark, SF, "events")
      .filter(F.col("user_id") === uid)
      .select(F.unix_micros(F.col("ts")).as("tu"), F.col("event_id"),
        (Tables.dec2(F.col("value")) * 100).cast("long").as("vc"))
      .orderBy("tu", "event_id").collect().map(_.getLong(2))
    val expect = vs.sliding(2).collect { case Array(a, b) if b > a => b - a }.sum
    val got = rows.find(_.get(0) == uid).get.getLong(2)
    assert(got == expect, s"user $uid: deltaSum $got vs driver fold $expect")
  }

  test("intervalLengthSum equals a driver-side interval-union sweep and never exceeds the raw length sum") {
    val rows = OlapSeriesQueries.qIntervalSum(spark, SF).collect()
    assert(rows.nonEmpty)
    val uid = rows.map(r => (r.getLong(1), r)).maxBy(_._1)._2.get(0) // busiest user: overlaps likely
    val iv = Tables(spark, SF, "events")
      .filter(F.col("user_id") === uid)
      .select(F.expr("unix_micros(ts) div 1000000").as("st"), F.col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(0) + 60L + r.getLong(1) % 600L))
      .sortBy(identity)
    val rawSum = iv.map { case (s, e) => e - s }.sum
    val union = iv.foldLeft((0L, Long.MinValue)) { case ((acc, hi), (s, e)) =>
      (acc + math.max(0L, e - math.max(s, hi)), math.max(hi, e))
    }._1
    val got = rows.find(_.get(0) == uid).get.getLong(2)
    assert(got == union, s"user $uid: covered $got vs driver sweep $union")
    assert(got <= rawSum, "union length cannot exceed the sum of interval lengths")
  }

  test("array-suite stats equal a driver-side recomputation for every user") {
    val ev = Tables(spark, SF, "events")
      .select(F.col("user_id"), F.unix_micros(F.col("ts")), F.col("event_id"),
        (Tables.dec2(F.col("value")) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    OlapSeriesQueries.qArrSuite(spark, SF).collect().foreach { r =>
      val vs = ev.filter(_._1 == r.getLong(0)).sortBy(e => (e._2, e._3)).map(_._4)
      assert(r.getLong(1) == vs.length)
      assert(r.getLong(2) == vs.filter(_ > 5000L).sum, "sum_hi")
      assert(r.getLong(3) == vs.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum, "zsum")
      assert(r.getString(4) == vs.distinct.sorted.reverse.take(3).mkString(","), "top3")
    }
  }

  test("sequenceNextNode picks the event right after the first click") {
    val ev = Tables(spark, SF, "events")
      .select(F.col("user_id"), F.unix_micros(F.col("ts")), F.col("event_id"), F.col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val got = OlapSeriesQueries.qSeqNextNode(spark, SF).collect()
    assert(got.length == ev.map(_._1).distinct.length)
    got.foreach { r =>
      val mine = ev.filter(_._1 == r.getLong(0)).sortBy(e => (e._2, e._3))
      val ci = mine.indexWhere(_._4 == "click")
      if (ci < 0 || ci == mine.length - 1) assert(r.isNullAt(1), s"user ${r.getLong(0)}: expected NULL")
      else {
        assert(r.getString(1) == mine(ci + 1)._4, s"user ${r.getLong(0)}: type")
        assert(r.getLong(2) == mine(ci + 1)._3, s"user ${r.getLong(0)}: witness id")
      }
    }
  }

  test("q_concurrency's sweep window partitions by (event_type, day)") {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val df = OlapSeriesQueries.qConcurrency(spark, SF)
    val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
    // two windows total: the per-(type, day) local sweep over the fat
    // point stream and the per-type carry over the TINY daily aggregate
    assert(windows.size == 2, windows.mkString("\n"))
    val partKeys = windows.map(_.partitionSpec.collect {
      case a: AttributeReference => a.name
    }.toSet)
    assert(partKeys.contains(Set("event_type", "day")),
      s"the fat sweep must sub-partition by day: $partKeys")
    // cross-day carry is exact: spot-check against the single-partition
    // formulation on sf0.001
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(F.col("t").asc, F.col("d").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val iv = Tables(spark, SF, "events")
      .select(F.col("event_type"), F.col("event_id"),
        F.expr("unix_micros(ts) div 1000000").as("st"))
      .withColumn("en", F.col("st") + 120L + F.col("event_id") % 300L)
    val pts = iv.select(F.col("event_type"), F.col("st").as("t"), F.lit(1L).as("d"))
      .unionAll(iv.select(F.col("event_type"), F.col("en").as("t"), F.lit(-1L).as("d")))
    val naive = pts.withColumn("run", F.sum("d").over(w))
      .groupBy(F.col("event_type"), F.expr("t div 3600").as("hr"))
      .agg(F.max("run").as("peak"), F.min("run").as("trough"),
        F.count(F.lit(1)).as("n_points"))
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet === naive)
  }
}
