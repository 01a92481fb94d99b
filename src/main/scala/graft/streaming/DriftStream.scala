package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Streaming distribution-drift monitor: per tumbling window, the binned
  * two-sample Kolmogorov-Smirnov distance between the window's value
  * distribution and a fixed reference sample (the batch counterpart is
  * q_ks_test / q_psi_drift).
  *
  * Design for unbounded streams: the window state is ONE row with a
  * `bins`-length histogram array (a conditional-sum aggregate, so
  * map-side partials merge by vector add in the state store) — never the
  * raw values, whose count per window is unbounded. The reference
  * distribution is reduced ONCE to `bins`+2 integers (bounds + cumulative
  * histogram) and baked into the plan as literals — a driver-side reduce
  * of a static, already-aggregated frame, not a stream-side collect. The
  * KS distance then folds over the two histograms inside a codegen'd
  * array expression on the single emitted row per window: exact integer
  * numerator max_b |cum_b·m − refcum_b·n|, floor-scaled d6, identical to
  * the batch q_ks_test discipline.
  */
object DriftStream {

  /** Reference distribution compiled to plan literals: equal-width bucket
    * bounds and the cumulative bucket counts of the reference sample. */
  final case class Ref(mn: Long, mx: Long, cum: Array[Long]) {
    def m: Long = cum.last
    def bins: Int = cum.length
  }

  /** Reduce a static reference sample (column `vc`: long) to its binned
    * cumulative histogram. The collect is of the B-row bucket aggregate,
    * not the sample. */
  def compileRef(reference: DataFrame, bins: Int = 16): Ref = {
    val b = reference.agg(F.min("vc"), F.max("vc")).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val counts = reference
      .select(F.expr(s"least(${bins - 1}, ((vc - $mn) * $bins) div (${mx - mn} + 1))").as("bucket"))
      .groupBy("bucket").agg(F.count(F.lit(1)).as("c"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val cum = new Array[Long](bins)
    var acc = 0L
    for (i <- 0 until bins) { acc += counts.getOrElse(i, 0L); cum(i) = acc }
    Ref(mn, mx, cum)
  }

  /** The streaming plan: events (`ts` timestamp, `value` double) →
    * (window_start, n, dnum, d6) per closed 1-hour window, append mode.
    * Values outside the reference range clamp into the edge buckets (the
    * standard binned-KS convention: drift mass beyond the reference
    * support lands in the extreme bins and maximises the cum gap). */
  def binnedKs(events: DataFrame, ref: Ref): DataFrame = {
    val B = ref.bins
    val vc = F.expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
    val bucket = F.greatest(F.lit(0L), F.least(F.lit((B - 1).toLong),
      F.expr(s"((vc - ${ref.mn}) * $B) div (${ref.mx - ref.mn} + 1)")))
    val hist = F.array((0 until B).map(b =>
      F.sum(F.when(F.col("bucket") === b, 1L).otherwise(0L))): _*)
    val refCum = F.array(ref.cum.map(F.lit(_)): _*)
    val agg = events
      .select(F.col("ts"), vc.as("vc"))
      .select(F.col("ts"), bucket.as("bucket"))
      .withWatermark("ts", "30 minutes")
      .groupBy(F.window(F.col("ts"), "1 hour").as("w"))
      .agg(hist.as("h"), F.count(F.lit(1)).as("n"))
    // fold the histogram into (cum, maxdiff) with one codegen'd aggregate
    // over the zipped (window cum, reference cum) pairs
    agg.select(F.col("w.start").as("window_start"), F.col("n"),
        F.expr(
          s"""aggregate(
             |  zip_with(h, array(${ref.cum.mkString(",")}),
             |           (a, b) -> struct(a as c, b as rc)),
             |  struct(cast(0 as bigint) as cum, cast(0 as bigint) as mx),
             |  (acc, x) -> struct(acc.cum + x.c as cum,
             |    greatest(acc.mx, abs((acc.cum + x.c) * ${ref.m} - x.rc * n)) as mx),
             |  acc -> acc.mx)""".stripMargin).as("dnum"))
      .select(F.col("window_start"), F.col("n"), F.col("dnum"),
        F.expr(s"cast((cast(dnum as decimal(38,0)) * 1000000) div (cast(n as decimal(38,0)) * ${ref.m}) as bigint)").as("d6"))
  }

  /** Streaming windowed approximate quantiles from the same bounded
    * histogram state: per tumbling window, p50/p95/p99 of the value
    * stream to one-bin resolution (the bin's lower cents bound), with the
    * bins spanning the reference range. The state per window is the same
    * single histogram row as binnedKs — never the values — so the
    * operator survives unbounded windows; resolution is (mx−mn)/bins,
    * the knob a production monitor turns. The quantile extraction is a
    * codegen'd fold over the emitted histogram: the first bin whose
    * cumulative count reaches ceil(q·n). */
  def binnedQuantiles(events: DataFrame, ref: Ref,
                      qs: Seq[Int] = Seq(50, 95, 99)): DataFrame = {
    val B = ref.bins
    val vc = F.expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
    val bucket = F.greatest(F.lit(0L), F.least(F.lit((B - 1).toLong),
      F.expr(s"((vc - ${ref.mn}) * $B) div (${ref.mx - ref.mn} + 1)")))
    val hist = F.array((0 until B).map(b =>
      F.sum(F.when(F.col("bucket") === b, 1L).otherwise(0L))): _*)
    val agg = events
      .select(F.col("ts"), vc.as("vc"))
      .select(F.col("ts"), bucket.as("bucket"))
      .withWatermark("ts", "30 minutes")
      .groupBy(F.window(F.col("ts"), "1 hour").as("w"))
      .agg(hist.as("h"), F.count(F.lit(1)).as("n"))
    val qCols = qs.map { q =>
      // bin index of the first cumulative count ≥ ceil(q%·n), then its
      // lower value bound in cents
      F.expr(
        s"""${ref.mn} + (cast(aggregate(h,
           |  struct(cast(0 as bigint) as cum, cast(-1 as bigint) as idx, cast(0 as bigint) as i),
           |  (acc, x) -> struct(acc.cum + x as cum,
           |    if(acc.idx < 0 and (acc.cum + x) * 100 >= n * $q, acc.i, acc.idx) as idx,
           |    acc.i + 1 as i),
           |  acc -> acc.idx) as bigint) * (${ref.mx - ref.mn} + 1)) div $B""".stripMargin)
        .as(s"p$q")
    }
    agg.select(F.col("w.start").as("window_start") +: F.col("n") +: qCols: _*)
  }

  /** Streaming PSI against the same compiled reference — the windowed
    * form of q_psi_drift, sharing binnedKs's one-histogram-row state
    * design. The per-bin reference counts are recovered from the
    * cumulative array (rc_b − rc_{b−1}) inside the fold; each smoothed
    * (p−q)·ln(p/q) term is BIGINT-rounded (×1e9, half-up) before the
    * integer sum, the same 1-ulp discipline as the batch metric. */
  def binnedPsi(events: DataFrame, ref: Ref): DataFrame = {
    val B = ref.bins
    val vc = F.expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
    val bucket = F.greatest(F.lit(0L), F.least(F.lit((B - 1).toLong),
      F.expr(s"((vc - ${ref.mn}) * $B) div (${ref.mx - ref.mn} + 1)")))
    val hist = F.array((0 until B).map(b =>
      F.sum(F.when(F.col("bucket") === b, 1L).otherwise(0L))): _*)
    val refHist = ref.cum.indices
      .map(i => if (i == 0) ref.cum(0) else ref.cum(i) - ref.cum(i - 1))
    events
      .select(F.col("ts"), vc.as("vc"))
      .select(F.col("ts"), bucket.as("bucket"))
      .withWatermark("ts", "30 minutes")
      .groupBy(F.window(F.col("ts"), "1 hour").as("w"))
      .agg(hist.as("h"), F.count(F.lit(1)).as("n"))
      .select(F.col("w.start").as("window_start"), F.col("n"),
        F.expr(
          s"""aggregate(
             |  zip_with(h, array(${refHist.mkString(",")}),
             |           (a, b) -> struct(a as c, b as rc)),
             |  cast(0 as bigint),
             |  (acc, x) -> acc + cast(floor(
             |    (cast(x.c + 1 as double) / cast(n + $B as double)
             |     - cast(x.rc + 1 as double) / cast(${ref.m} + $B as double))
             |    * ln((cast(x.c + 1 as double) / cast(n + $B as double))
             |       / (cast(x.rc + 1 as double) / cast(${ref.m} + $B as double))) * 1e9 + 0.5) as bigint))""".stripMargin)
          .as("psi9"))
  }
}
