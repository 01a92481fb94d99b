package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming binned-KS drift: the per-window statistic must equal the
  * plain-Scala binned KS over the same values, and state is a histogram
  * row per window (exercised across micro-batches). */
class DriftStreamSpec extends SparkSpec {

  final case class V(ts: Timestamp, value: Double)

  private val Base = 24 * 60L // minutes; ts==0 would be pre-watermark
  private def ts(minutes: Long): Timestamp = new Timestamp((Base + minutes) * 60 * 1000L)
  private def mins(t: Timestamp): Long = t.getTime / 60000 - Base

  /** Plain-Scala replica of the binned KS numerator for one window. */
  private def ksNum(vals: Seq[Long], ref: DriftStream.Ref): (Long, Long) = {
    val b = ref.bins
    val hist = new Array[Long](b)
    vals.foreach { v =>
      val i = math.max(0L, math.min((b - 1).toLong,
        (v - ref.mn) * b / (ref.mx - ref.mn + 1))).toInt
      hist(i) += 1
    }
    val n = vals.size.toLong
    var cum = 0L; var mx = 0L
    for (i <- 0 until b) {
      cum += hist(i)
      mx = math.max(mx, math.abs(cum * ref.m - ref.cum(i) * n))
    }
    (n, mx)
  }

  test("windowed binned KS equals the Scala replica; reference-like window scores ~0") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // reference: cents 0,100,200,...,9900 — uniform over [0, 10000)
    val refVals = (0L until 100L).map(_ * 100)
    val ref = DriftStream.compileRef(refVals.toDF("vc"), bins = 16)
    assert(ref.m === 100L && ref.mn === 0L && ref.mx === 9900L)

    val in = MemoryStream[V]
    val q = DriftStream.binnedKs(in.toDF(), ref)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode(OutputMode.Append).start()
    try {
      // window 0: uniform like the reference (cents v*100 for v=0..59)
      val w0 = (0L until 60L).map(v => V(ts(v), v * 100 * 1.65 % 100))
      // window 1: concentrated high (all mass in the top bins)
      val w1 = (0L until 60L).map(v => V(ts(60 + v), 95.0 + (v % 5)))
      in.addData(w0: _*)
      q.processAllAvailable()
      in.addData(w1: _*)
      q.processAllAvailable()
      in.addData(V(ts(400), 1.0)) // push the watermark past both windows
      q.processAllAvailable()
      val got = spark.table("drift_out")
        .collect().map(r => mins(r.getTimestamp(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      def cents(vs: Seq[V]): Seq[Long] =
        vs.map(v => (BigDecimal(v.value).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong)
      val (n0, d0) = ksNum(cents(w0), ref)
      val (n1, d1) = ksNum(cents(w1), ref)
      assert(got(0L) === ((n0, d0, d0 * 1000000L / (n0 * ref.m))), s"got $got")
      assert(got(60L) === ((n1, d1, d1 * 1000000L / (n1 * ref.m))), s"got $got")
      // sanity on the semantics, not just the replica: the drifted window
      // is near the maximum (1e6), the uniform-ish one well below it
      assert(got(60L)._3 > 900000L)
      assert(got(0L)._3 < 200000L)
    } finally q.stop()
  }

  /** Plain-Scala replica of the streaming smoothed-PSI sum. */
  private def psi9(vals: Seq[Long], ref: DriftStream.Ref): Long = {
    val b = ref.bins
    val hist = new Array[Long](b)
    vals.foreach { v =>
      val i = math.max(0L, math.min((b - 1).toLong,
        (v - ref.mn) * b / (ref.mx - ref.mn + 1))).toInt
      hist(i) += 1
    }
    val n = vals.size.toLong
    (0 until b).map { i =>
      val rc = if (i == 0) ref.cum(0) else ref.cum(i) - ref.cum(i - 1)
      val p = (hist(i) + 1).toDouble / (n + b)
      val q = (rc + 1).toDouble / (ref.m + b)
      math.floor((p - q) * math.log(p / q) * 1e9 + 0.5).toLong
    }.sum
  }

  test("windowed PSI equals the Scala replica and separates drifted from stable windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val refVals = (0L until 100L).map(_ * 100)
    val ref = DriftStream.compileRef(refVals.toDF("vc"), bins = 16)
    val in = MemoryStream[V]
    val q = DriftStream.binnedPsi(in.toDF(), ref)
      .writeStream.format("memory").queryName("psi_out")
      .outputMode(OutputMode.Append).start()
    try {
      val w0 = (0L until 60L).map(v => V(ts(v), v * 100 * 1.65 % 100))
      val w1 = (0L until 60L).map(v => V(ts(60 + v), 95.0 + (v % 5)))
      in.addData(w0: _*); q.processAllAvailable()
      in.addData(w1: _*); q.processAllAvailable()
      in.addData(V(ts(400), 1.0)); q.processAllAvailable()
      val got = spark.table("psi_out")
        .collect().map(r => mins(r.getTimestamp(0)) -> (r.getLong(1), r.getLong(2))).toMap
      def cents(vs: Seq[V]): Seq[Long] =
        vs.map(v => (BigDecimal(v.value).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong)
      assert(got(0L) === ((60L, psi9(cents(w0), ref))), s"got $got")
      assert(got(60L) === ((60L, psi9(cents(w1), ref))), s"got $got")
      assert(got(60L)._2 > got(0L)._2 * 5, s"got $got") // drift separates
    } finally q.stop()
  }

  /** Plain-Scala replica: lower cents bound of the bin holding pct. */
  private def binnedQ(vals: Seq[Long], ref: DriftStream.Ref, pct: Int): Long = {
    val b = ref.bins
    val hist = new Array[Long](b)
    vals.foreach { v =>
      val i = math.max(0L, math.min((b - 1).toLong,
        (v - ref.mn) * b / (ref.mx - ref.mn + 1))).toInt
      hist(i) += 1
    }
    val n = vals.size.toLong
    var cum = 0L
    val idx = (0 until b).find { i => cum += hist(i); cum * 100 >= n * pct }.get
    ref.mn + idx.toLong * (ref.mx - ref.mn + 1) / b
  }

  test("windowed binned quantiles equal the Scala replica at bin resolution") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val refVals = (0L until 100L).map(_ * 100)
    val ref = DriftStream.compileRef(refVals.toDF("vc"), bins = 16)
    val in = MemoryStream[V]
    val q = DriftStream.binnedQuantiles(in.toDF(), ref)
      .writeStream.format("memory").queryName("quant_out")
      .outputMode(OutputMode.Append).start()
    try {
      val w0 = (0L until 80L).map(v => V(ts(v % 60), (v * 97 % 100).toDouble))
      in.addData(w0: _*); q.processAllAvailable()
      in.addData(V(ts(400), 1.0)); q.processAllAvailable()
      val got = spark.table("quant_out")
        .collect().map(r => mins(r.getTimestamp(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val cents = w0.map(v => (BigDecimal(v.value).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong)
      assert(got(0L) === ((80L, binnedQ(cents, ref, 50), binnedQ(cents, ref, 95),
        binnedQ(cents, ref, 99))), s"got $got")
      // semantic sanity: p50 ≤ p95 ≤ p99 and within the reference range
      val (_, p50, p95, p99) = got(0L)
      assert(p50 <= p95 && p95 <= p99 && p50 >= ref.mn && p99 <= ref.mx)
    } finally q.stop()
  }
}
