package graft.olap

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** The approx-percentile SCALE TIER of the two equi-depth cut operators
  * (q_histogram_eqd, d_ppl_bucket): counts stay exact per bucket, only
  * cut placement is approximate — each cut must land within the
  * sketch's rank tolerance of its exact target, and the sub-partitioned
  * plans must avoid the per-type global sort the ntile tier pays. */
class EqdCutsSpec extends SparkSpec {

  test("histogram-eqd cuts land within rank tolerance of exact targets") {
    val accuracy = 10000
    val buckets = 8
    val out = OlapCombinatorQueries
      .qHistogramEqdCuts(spark, SF, buckets, accuracy)
      .collect()
    val v = graft.Tables(spark, SF, "events")
      .select(F.col("event_type"),
        (graft.Tables.dec2(F.col("value")) * 100).cast("long").as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    for ((tpe, vals) <- v) {
      val n = vals.size
      val tol = math.max(1.0, n.toDouble / accuracy) + 1
      val rows = out.filter(_.getString(0) == tpe).sortBy(_.getLong(1))
      // buckets partition the rows exactly (counts sum to n)
      assert(rows.map(_.getLong(2)).sum == n, s"$tpe: counts must sum to n")
      // cumulative bucket boundaries sit within rank tolerance of i*n/8
      var cum = 0L
      rows.dropRight(1).zipWithIndex.foreach { case (r, i) =>
        cum += r.getLong(2)
        val target = (i + 1).toDouble * n / buckets
        assert(math.abs(cum - target) <= tol + n * 0.001 + 8,
          s"$tpe bucket ${i + 1}: cum=$cum target=$target tol=$tol")
      }
      // bucket value ranges are disjoint and ordered
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) <= b.getLong(3),
          s"$tpe: bucket ranges must not overlap: $a vs $b")
        case _ => ()
      }
    }
  }

  test("ppl-bucket cuts agree with exact terciles outside rank tolerance") {
    val approx = graft.pipeline.PipelineQueries.dPplBucketCuts(spark, SF)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    val exact = graft.pipeline.PipelineQueries.dPplBucket(spark, SF)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    assert(approx.size == exact.length)
    // per language: the approx assignment may only differ from exact
    // NEAR the tercile boundary — bound the disagreement mass
    val byLang = exact.groupBy(_._2)
    for ((lang, rows) <- byLang) {
      val n = rows.length
      val diff = rows.count { case (id, _, e) => approx(id) != e }
      // each of the 2 cuts may shift by rank error (n/accuracy, floored
      // at 1) plus tie mass at the cut value; sf0.001 scores are fine-
      // grained so a 2% + 4 row bound is generous yet still proves the
      // assignments track the exact terciles
      assert(diff <= n * 0.02 + 4, s"$lang: $diff of $n assignments differ")
    }
  }

  test("the cuts plans avoid the per-type global-sort window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Sort, Window}
    val dfs = Seq(
      OlapCombinatorQueries.qHistogramEqdCuts(spark, SF),
      graft.pipeline.PipelineQueries.dPplBucketCuts(spark, SF))
    dfs.foreach { df =>
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect { case w: Window => w }.isEmpty,
        s"scale tier must not carry a window operator:\n$plan")
      assert(plan.collect { case s: Sort if s.global => s }.isEmpty,
        s"scale tier must not carry a global sort:\n$plan")
    }
  }
}
