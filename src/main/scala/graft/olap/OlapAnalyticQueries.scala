package graft.olap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{functions => F}

import graft.Tables
import graft.Tables.dec2

/** Higher-order statistical and sweep-line aggregates (ClickHouse
  * `skewPop`/`kurtPop`, `simpleLinearRegression`, `mannWhitneyUTest`/
  * `arrayAUC`, `groupBitAnd/Or/Xor`, `quantileExactWeighted`,
  * `boundingRatio`, `maxIntersections`).
  *
  * Same cross-engine float discipline as [[OlapStatQueries]]: aggregation
  * state is exact (BIGINT / DECIMAL moment sums, integer rank sums,
  * sweep counters); doubles appear only in a terminal closed form whose
  * IEEE operation tree is written identically in the Spark plan and the
  * oracle SQL (divisions, multiplications and sqrt are all correctly
  * rounded, so identical exact inputs give identical bits), and
  * multi-step results are floor-scaled to BIGINT. Every aggregate here is
  * partial-aggregatable (one shuffle on the group key) or one window sort
  * per group — no self-joins, no driver round-trips, so each shape is a
  * single exchange at any scale.
  */
object OlapAnalyticQueries {
  type Q = (SparkSession, String) => DataFrame

  private val d38 = DecimalType(38, 0)
  private def d(c: String): Column = F.col(c).cast("double")

  /** q_skew_kurt: ClickHouse `skewPop`/`kurtPop` — population skewness and
    * excess-free kurtosis of l_quantity per return flag. One
    * partial-aggregatable pass accumulates the four raw power sums as
    * BIGINTs (quantity ≤ 50 ⇒ q⁴ ≤ 6.25e6 per row; the sums stay under
    * 2^53 through sf≈100, so the BIGINT→DOUBLE casts are exact), then the
    * central-moment closed form runs in doubles with the identical
    * operation tree on both engines; outputs floor-scaled to 1e-6. */
  def qSkewKurt(s: SparkSession, dir: String): DataFrame = {
    val x = F.col("l_quantity").cast("long")
    val agg = Tables(s, dir, "lineitem")
      .select(F.col("l_returnflag"), x.as("x"))
      .groupBy("l_returnflag")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum("x").as("s1"),
        F.sum(F.col("x") * F.col("x")).as("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).as("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).as("s4"))
    val mu = d("s1") / d("n")
    val t2 = d("s2") / d("n")
    val t3 = d("s3") / d("n")
    val t4 = d("s4") / d("n")
    val m2 = t2 - mu * mu
    val m3 = t3 - F.lit(3.0) * mu * t2 + F.lit(2.0) * mu * mu * mu
    val m4 = t4 - F.lit(4.0) * mu * t3 + F.lit(6.0) * mu * mu * t2 -
      F.lit(3.0) * mu * mu * mu * mu
    agg.select(F.col("l_returnflag"), F.col("n"),
      F.floor(m3 / (F.sqrt(m2) * m2) * 1e6).as("skew6"),
      F.floor(m4 / (m2 * m2) * 1e6).as("kurt6"))
  }

  val qSkewKurtSql: String =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |   CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x*x) AS BIGINT) AS s2,
      |   CAST(SUM(x*x*x) AS BIGINT) AS s3, CAST(SUM(x*x*x*x) AS BIGINT) AS s4
      |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x FROM lineitem)
      |  GROUP BY 1),
      |t AS (
      |  SELECT l_returnflag, n,
      |   CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE) AS mu,
      |   CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE) AS t2,
      |   CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE) AS t3,
      |   CAST(s4 AS DOUBLE)/CAST(n AS DOUBLE) AS t4
      |  FROM m),
      |c AS (
      |  SELECT l_returnflag, n,
      |   t2 - mu*mu AS m2,
      |   t3 - 3.0*mu*t2 + 2.0*mu*mu*mu AS m3,
      |   t4 - 4.0*mu*t3 + 6.0*mu*mu*t2 - 3.0*mu*mu*mu*mu AS m4
      |  FROM t)
      |SELECT l_returnflag, n,
      | CAST(floor(m3 / (sqrt(m2) * m2) * 1e6) AS BIGINT) AS skew6,
      | CAST(floor(m4 / (m2 * m2) * 1e6) AS BIGINT) AS kurt6
      |FROM c""".stripMargin

  /** q_linreg: ClickHouse `simpleLinearRegression(x, y)` — least-squares
    * slope/intercept of order total (cents) against order date (epoch
    * days) per priority class. The five moment sums accumulate exactly
    * (DECIMAL — x·y ≈ 6e11 per row overflows a double's 2^53 long before
    * a DECIMAL(38) sum saturates); slope's numerator and denominator are
    * then formed exactly in DECIMAL (HUGEINT on the oracle) so the only
    * doubles are two correctly-rounded casts and one division. Slope is
    * floor-scaled; the intercept closed form reuses the bit-identical
    * slope double. */
  def qLinreg(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables(s, dir, "orders")
      .select(F.col("o_orderpriority"),
        F.expr("datediff(cast(o_orderdate as date), date'1970-01-01')").cast("long").as("x"),
        (dec2(F.col("o_totalprice")) * 100).cast("long").as("y"))
      .groupBy("o_orderpriority")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum("x").as("sx"), F.sum("y").as("sy"),
        F.sum((F.col("x") * F.col("y")).cast(DecimalType(28, 0))).as("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(DecimalType(28, 0))).as("sxx"))
    val num = (F.col("n").cast(d38) * F.col("sxy").cast(d38) -
      F.col("sx").cast(d38) * F.col("sy").cast(d38)).cast("double")
    val den = (F.col("n").cast(d38) * F.col("sxx").cast(d38) -
      F.col("sx").cast(d38) * F.col("sx").cast(d38)).cast("double")
    val slope = num / den
    val icept = (d("sy") - slope * d("sx")) / d("n")
    agg.select(F.col("o_orderpriority"), F.col("n"),
      F.floor(slope * 1e6).as("slope6"),
      F.floor(icept).as("icept_c"))
  }

  val qLinregSql: String =
    """WITH m AS (
      |  SELECT o_orderpriority, COUNT(*) AS n,
      |   CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
      |   CAST(SUM(x*y) AS HUGEINT) AS sxy, CAST(SUM(x*x) AS HUGEINT) AS sxx
      |  FROM (SELECT o_orderpriority, epoch_us(o_orderdate) // 86400000000 AS x,
      |          CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS y
      |        FROM orders)
      |  GROUP BY 1),
      |t AS (
      |  SELECT o_orderpriority, n, sx, sy,
      |   CAST(CAST(n AS HUGEINT)*sxy - sx*sy AS DOUBLE)
      |     / CAST(CAST(n AS HUGEINT)*sxx - sx*sx AS DOUBLE) AS slope
      |  FROM m)
      |SELECT o_orderpriority, n,
      | CAST(floor(slope * 1e6) AS BIGINT) AS slope6,
      | CAST(floor((CAST(sy AS DOUBLE) - slope*CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS BIGINT) AS icept_c
      |FROM t""".stripMargin

  /** q_mwu_auc: ClickHouse `mannWhitneyUTest` / `arrayAUC` — the exact
    * Mann-Whitney U statistic (≡ ROC AUC numerator) comparing click vs
    * purchase value distributions per day-of-week cohort. Tie handling is
    * the midrank convention kept in INTEGERS: 2·midrank = 2·rank() +
    * tiecount − 1, so the rank sum is an exact BIGINT; AUC = U/(n1·n2) is
    * the one terminal division. One window sort over the combined sample
    * per cohort — no pairwise comparison join (the textbook O(n1·n2)
    * definition), so it scales as a sort, not a cross product. */
  def qMwuAuc(s: SparkSession, dir: String): DataFrame = {
    val wr = Window.partitionBy("g").orderBy(F.col("vc").asc)
    val wc = Window.partitionBy("g", "vc")
    val r = Tables(s, dir, "events")
      .filter(F.col("event_type").isin("click", "purchase"))
      .select(F.expr("unix_micros(ts) div 86400000000 % 7").as("g"),
        F.col("event_type").as("et"),
        (dec2(F.col("value")) * 100).cast("long").as("vc"))
      .withColumn("tr2",
        F.lit(2L) * F.rank().over(wr).cast("long") + F.count(F.lit(1)).over(wc) - 1L)
    val m = r.groupBy("g")
      .agg(F.count(F.when(F.col("et") === "click", 1)).as("n1"),
        F.count(F.when(F.col("et") === "purchase", 1)).as("n2"),
        F.sum(F.when(F.col("et") === "click", F.col("tr2"))).as("r1x2"))
    m.filter(F.col("n1") > 0L && F.col("n2") > 0L) // U/AUC undefined on an empty side
      .select(F.col("g"), F.col("n1"), F.col("n2"),
      (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1L)).as("u2"))
      .select(F.col("g"), F.col("n1"), F.col("n2"), F.col("u2"),
        (F.col("u2").cast("double") /
          (F.lit(2L) * F.col("n1") * F.col("n2")).cast("double")).as("auc"))
  }

  val qMwuAucSql: String =
    """WITH ev AS (
      |  SELECT epoch_us(ts) // 86400000000 % 7 AS g, event_type AS et,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc
      |  FROM events WHERE event_type IN ('click','purchase')),
      |r AS (
      |  SELECT g, et,
      |   2*CAST(RANK() OVER (PARTITION BY g ORDER BY vc ASC) AS BIGINT)
      |     + COUNT(*) OVER (PARTITION BY g, vc) - 1 AS tr2
      |  FROM ev),
      |m AS (
      |  SELECT g, COUNT(CASE WHEN et = 'click' THEN 1 END) AS n1,
      |   COUNT(CASE WHEN et = 'purchase' THEN 1 END) AS n2,
      |   CAST(SUM(CASE WHEN et = 'click' THEN tr2 END) AS BIGINT) AS r1x2
      |  FROM r GROUP BY 1
      |  HAVING COUNT(CASE WHEN et = 'click' THEN 1 END) > 0
      |     AND COUNT(CASE WHEN et = 'purchase' THEN 1 END) > 0)
      |SELECT g, n1, n2, r1x2 - n1*(n1+1) AS u2,
      | CAST(r1x2 - n1*(n1+1) AS DOUBLE) / CAST(2*n1*n2 AS DOUBLE) AS auc
      |FROM m""".stripMargin

  /** q_bitops: ClickHouse `groupBitAnd`/`groupBitOr`/`groupBitXor` —
    * bitwise aggregates over user ids per event type. Trivially
    * partial-aggregatable exact BIGINT state (these are the sketchiest
    * possible "sketches": 8 bytes per group regardless of cardinality). */
  def qBitops(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy("event_type")
      .agg(F.count(F.lit(1)).as("n"),
        F.expr("bit_and(user_id)").as("band"),
        F.expr("bit_or(user_id)").as("bor"),
        F.expr("bit_xor(user_id)").as("bxor"))

  val qBitopsSql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(bit_and(user_id) AS BIGINT) AS band,
      | CAST(bit_or(user_id) AS BIGINT) AS bor,
      | CAST(bit_xor(user_id) AS BIGINT) AS bxor
      |FROM events GROUP BY 1""".stripMargin

  /** q_wmedian: ClickHouse `quantileExactWeighted(0.5)(price, qty)` —
    * the exact quantity-weighted median of extended price per return
    * flag: the smallest price whose cumulative weight reaches half the
    * total. Duplicate prices pre-aggregate (one hash agg) so the window
    * sort runs over distinct values; `2·cum ≥ tot` keeps the half
    * threshold in integers. All BIGINT. */
  def qWMedian(s: SparkSession, dir: String): DataFrame = {
    val cumW = Window.partitionBy("g").orderBy(F.col("vc").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy("g")
    Tables(s, dir, "lineitem")
      .select(F.col("l_returnflag").as("g"),
        (dec2(F.col("l_extendedprice")) * 100).cast("long").as("vc"),
        F.col("l_quantity").cast("long").as("w"))
      .groupBy("g", "vc").agg(F.sum("w").as("w"))
      .withColumn("cum", F.sum("w").over(cumW))
      .withColumn("tot", F.sum("w").over(totW))
      .groupBy("g")
      .agg(F.max("tot").as("tot_w"),
        F.min(F.when(F.lit(2L) * F.col("cum") >= F.col("tot"), F.col("vc"))).as("wmedian_c"))
      .withColumnRenamed("g", "l_returnflag")
  }

  val qWMedianSql: String =
    """WITH v AS (
      |  SELECT l_returnflag AS g,
      |   CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS vc,
      |   CAST(l_quantity AS BIGINT) AS w
      |  FROM lineitem),
      |gv AS (SELECT g, vc, CAST(SUM(w) AS BIGINT) AS w FROM v GROUP BY 1, 2),
      |c AS (
      |  SELECT g, vc, w,
      |   SUM(w) OVER (PARTITION BY g ORDER BY vc ASC ROWS UNBOUNDED PRECEDING) AS cum,
      |   SUM(w) OVER (PARTITION BY g) AS tot
      |  FROM gv)
      |SELECT g AS l_returnflag, CAST(MAX(tot) AS BIGINT) AS tot_w,
      | CAST(MIN(CASE WHEN 2*cum >= tot THEN vc END) AS BIGINT) AS wmedian_c
      |FROM c GROUP BY 1""".stripMargin

  /** q_bounding_ratio: ClickHouse `boundingRatio(t, v)` — the slope
    * between the first and last point of each user's time-ordered value
    * series, in cents/second. First/last are one min/max over
    * (t, event_id, v) structs (total order ⇒ deterministic witnesses, no
    * second pass); the output is a single division of exact BIGINTs —
    * bit-identical across engines. NULL when the series has no time
    * extent. */
  def qBoundingRatio(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables(s, dir, "events")
      .select(F.col("user_id"), F.unix_micros(F.col("ts")).as("tu"),
        F.col("event_id"), (dec2(F.col("value")) * 100).cast("long").as("vc"))
      .groupBy("user_id")
      .agg(F.count(F.lit(1)).as("n"),
        F.min(F.struct(F.col("tu"), F.col("event_id").as("k"), F.col("vc"))).as("f"),
        F.max(F.struct(F.col("tu"), F.col("event_id").as("k"), F.col("vc"))).as("l"))
    val num = (F.col("l.vc") - F.col("f.vc")) * 1000000L
    val den = F.col("l.tu") - F.col("f.tu")
    agg.select(F.col("user_id"), F.col("n"),
      (num.cast("double") / F.when(den =!= 0L, den).cast("double")).as("slope_cps"))
  }

  val qBoundingRatioSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tu,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc
      |  FROM events),
      |r AS (
      |  SELECT *,
      |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tu ASC, event_id ASC) AS rf,
      |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tu DESC, event_id DESC) AS rl
      |  FROM ev),
      |m AS (
      |  SELECT user_id, COUNT(*) AS n,
      |   MAX(CASE WHEN rf = 1 THEN vc END) AS vf, MAX(CASE WHEN rl = 1 THEN vc END) AS vl,
      |   MAX(CASE WHEN rf = 1 THEN tu END) AS tf, MAX(CASE WHEN rl = 1 THEN tu END) AS tl
      |  FROM r GROUP BY 1)
      |SELECT user_id, n,
      | CAST((vl - vf)*1000000 AS DOUBLE) / CAST(NULLIF(tl - tf, 0) AS DOUBLE) AS slope_cps
      |FROM m""".stripMargin

  /** q_max_intersections: ClickHouse `maxIntersections` /
    * `maxIntersectionsPosition` — the peak number of simultaneously open
    * activity intervals per user and the first time it is reached. The
    * classic sweep: each interval contributes (+1 at start, −1 at end),
    * one window sort orders endpoints (ends before starts at ties —
    * half-open [st,en) semantics), the running sum's max is the answer.
    * Within an equal (t,delta) run the prefix-sum MULTISET is
    * order-invariant, so max and its earliest time are deterministic
    * without a full tiebreak. Intervals are the q_interval_sum family's
    * data-derived ones. */
  def qMaxIntersections(s: SparkSession, dir: String): DataFrame = {
    val iv = Tables(s, dir, "events")
      .select(F.col("user_id"), F.col("event_id"),
        F.expr("unix_micros(ts) div 1000000").as("st"))
      .withColumn("en", F.col("st") + 60L + F.col("event_id") % 600L)
    val pts = iv.select(F.col("user_id"), F.col("st").as("t"), F.lit(1L).as("d"))
      .unionAll(iv.select(F.col("user_id"), F.col("en").as("t"), F.lit(-1L).as("d")))
    val sweep = Window.partitionBy("user_id").orderBy(F.col("t").asc, F.col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = Window.partitionBy("user_id")
    pts.withColumn("run", F.sum("d").over(sweep))
      .withColumn("mr", F.max("run").over(peak))
      .groupBy("user_id")
      .agg(F.max("run").as("max_stack"),
        F.min(F.when(F.col("run") === F.col("mr"), F.col("t"))).as("pos_t"))
  }

  val qMaxIntersectionsSql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS st,
      |   epoch_us(ts) // 1000000 + 60 + event_id % 600 AS en
      |  FROM events),
      |pts AS (
      |  SELECT user_id, st AS t, CAST(1 AS BIGINT) AS d FROM iv
      |  UNION ALL
      |  SELECT user_id, en AS t, CAST(-1 AS BIGINT) AS d FROM iv),
      |sw AS (
      |  SELECT user_id, t,
      |   SUM(d) OVER (PARTITION BY user_id ORDER BY t ASC, d ASC ROWS UNBOUNDED PRECEDING) AS run
      |  FROM pts),
      |mx AS (SELECT user_id, t, run, MAX(run) OVER (PARTITION BY user_id) AS mr FROM sw)
      |SELECT user_id, CAST(MAX(run) AS BIGINT) AS max_stack,
      | CAST(MIN(CASE WHEN run = mr THEN t END) AS BIGINT) AS pos_t
      |FROM mx GROUP BY 1""".stripMargin

  /** q_ttest: ClickHouse `welchTTest(value, sample)` — Welch's
    * t-statistic comparing click vs purchase value distributions per
    * day-of-week cohort (the q_mwu_auc pairing, parametric flavor). Six
    * exact BIGINT moment sums in one grouped pass; the closed form
    * t = (m1−m2)/sqrt(v1/n1 + v2/n2) (population variances — the
    * deterministic, df-free formulation) runs in doubles with the
    * identical IEEE tree on both engines; floor-scaled to 1e-6. */
  def qTtest(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables(s, dir, "events")
      .filter(F.col("event_type").isin("click", "purchase"))
      .select(F.expr("unix_micros(ts) div 86400000000 % 7").as("g"),
        F.col("event_type").as("et"),
        (dec2(F.col("value")) * 100).cast("long").as("vc"))
      .groupBy("g")
      .agg(
        F.count(F.when(F.col("et") === "click", 1)).as("n1"),
        F.sum(F.when(F.col("et") === "click", F.col("vc")).otherwise(0L)).as("s1"),
        F.sum(F.when(F.col("et") === "click", F.col("vc") * F.col("vc")).otherwise(0L)).as("q1"),
        F.count(F.when(F.col("et") === "purchase", 1)).as("n2"),
        F.sum(F.when(F.col("et") === "purchase", F.col("vc")).otherwise(0L)).as("s2"),
        F.sum(F.when(F.col("et") === "purchase", F.col("vc") * F.col("vc")).otherwise(0L)).as("q2"))
    val m1 = d("s1") / d("n1"); val m2 = d("s2") / d("n2")
    val v1 = d("q1") / d("n1") - m1 * m1
    val v2 = d("q2") / d("n2") - m2 * m2
    // a day with either sample empty has no defined t: filter on BOTH
    // engines rather than diverge on the zero divisor
    agg.filter(F.col("n1") > 0L && F.col("n2") > 0L)
      .select(F.col("g"), F.col("n1"), F.col("n2"),
        F.floor((m1 - m2) / F.sqrt(v1 / d("n1") + v2 / d("n2")) * 1e6).as("t6"))
  }

  val qTtestSql: String =
    """WITH ev AS (
      |  SELECT epoch_us(ts) // 86400000000 % 7 AS g, event_type AS et,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc
      |  FROM events WHERE event_type IN ('click','purchase')),
      |m AS (
      |  SELECT g,
      |   COUNT(CASE WHEN et = 'click' THEN 1 END) AS n1,
      |   CAST(SUM(CASE WHEN et = 'click' THEN vc ELSE 0 END) AS BIGINT) AS s1,
      |   CAST(SUM(CASE WHEN et = 'click' THEN vc*vc ELSE 0 END) AS BIGINT) AS q1,
      |   COUNT(CASE WHEN et = 'purchase' THEN 1 END) AS n2,
      |   CAST(SUM(CASE WHEN et = 'purchase' THEN vc ELSE 0 END) AS BIGINT) AS s2,
      |   CAST(SUM(CASE WHEN et = 'purchase' THEN vc*vc ELSE 0 END) AS BIGINT) AS q2
      |  FROM ev GROUP BY 1
      |  HAVING COUNT(CASE WHEN et = 'click' THEN 1 END) > 0
      |     AND COUNT(CASE WHEN et = 'purchase' THEN 1 END) > 0),
      |t AS (
      |  SELECT g, n1, n2,
      |   CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) AS m1,
      |   CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE) AS m2,
      |   CAST(q1 AS DOUBLE)/CAST(n1 AS DOUBLE) AS t1,
      |   CAST(q2 AS DOUBLE)/CAST(n2 AS DOUBLE) AS t2
      |  FROM m)
      |SELECT g, n1, n2,
      | CAST(floor((m1 - m2)
      |   / sqrt((t1 - m1*m1) / CAST(n1 AS DOUBLE) + (t2 - m2*m2) / CAST(n2 AS DOUBLE))
      |   * 1e6) AS BIGINT) AS t6
      |FROM t""".stripMargin

  /** q_studentt: ClickHouse `studentTTest(value, sample)` — the
    * equal-variance (pooled) Student's t over the same click/purchase
    * cohort pairing as q_ttest. Same six exact BIGINT moment sums; the
    * pooled form needs SUM-OF-SQUARED-DEVIATIONS ssᵢ = qᵢ − sᵢ²/nᵢ and
    * sp² = (ss1+ss2)/(n1+n2−2), then t = (m1−m2)/√(sp²·(1/n1+1/n2)) —
    * every double op an identical IEEE tree on both engines,
    * floor-scaled to 1e-6; df emitted alongside (the reference
    * statistic's second component). */
  def qStudentT(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables(s, dir, "events")
      .filter(F.col("event_type").isin("click", "purchase"))
      .select(F.expr("unix_micros(ts) div 86400000000 % 7").as("g"),
        F.col("event_type").as("et"),
        (dec2(F.col("value")) * 100).cast("long").as("vc"))
      .groupBy("g")
      .agg(
        F.count(F.when(F.col("et") === "click", 1)).as("n1"),
        F.sum(F.when(F.col("et") === "click", F.col("vc")).otherwise(0L)).as("s1"),
        F.sum(F.when(F.col("et") === "click", F.col("vc") * F.col("vc")).otherwise(0L)).as("q1"),
        F.count(F.when(F.col("et") === "purchase", 1)).as("n2"),
        F.sum(F.when(F.col("et") === "purchase", F.col("vc")).otherwise(0L)).as("s2"),
        F.sum(F.when(F.col("et") === "purchase", F.col("vc") * F.col("vc")).otherwise(0L)).as("q2"))
    val m1 = d("s1") / d("n1"); val m2 = d("s2") / d("n2")
    val ss1 = d("q1") - d("s1") * d("s1") / d("n1")
    val ss2 = d("q2") - d("s2") * d("s2") / d("n2")
    val dfC = F.col("n1") + F.col("n2") - 2
    val sp2 = (ss1 + ss2) / dfC.cast("double")
    // both samples non-empty AND df > 0, or the pooled variance and the
    // statistic are undefined (filtered identically on both engines)
    agg.filter(F.col("n1") > 0L && F.col("n2") > 0L &&
        F.col("n1") + F.col("n2") > 2L)
      .select(F.col("g"), F.col("n1"), F.col("n2"), dfC.as("df"),
        F.floor((m1 - m2)
          / F.sqrt(sp2 * (F.lit(1.0) / d("n1") + F.lit(1.0) / d("n2"))) * 1e6).as("t6"))
  }

  val qStudentTSql: String =
    """WITH ev AS (
      |  SELECT epoch_us(ts) // 86400000000 % 7 AS g, event_type AS et,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc
      |  FROM events WHERE event_type IN ('click','purchase')),
      |m AS (
      |  SELECT g,
      |   COUNT(CASE WHEN et = 'click' THEN 1 END) AS n1,
      |   CAST(SUM(CASE WHEN et = 'click' THEN vc ELSE 0 END) AS BIGINT) AS s1,
      |   CAST(SUM(CASE WHEN et = 'click' THEN vc*vc ELSE 0 END) AS BIGINT) AS q1,
      |   COUNT(CASE WHEN et = 'purchase' THEN 1 END) AS n2,
      |   CAST(SUM(CASE WHEN et = 'purchase' THEN vc ELSE 0 END) AS BIGINT) AS s2,
      |   CAST(SUM(CASE WHEN et = 'purchase' THEN vc*vc ELSE 0 END) AS BIGINT) AS q2
      |  FROM ev GROUP BY 1
      |  HAVING COUNT(CASE WHEN et = 'click' THEN 1 END) > 0
      |     AND COUNT(CASE WHEN et = 'purchase' THEN 1 END) > 0
      |     AND COUNT(CASE WHEN et = 'click' THEN 1 END)
      |       + COUNT(CASE WHEN et = 'purchase' THEN 1 END) > 2),
      |t AS (
      |  SELECT g, n1, n2,
      |   CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) AS m1,
      |   CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE) AS m2,
      |   CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) AS ss1,
      |   CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE) AS ss2
      |  FROM m)
      |SELECT g, n1, n2, n1 + n2 - 2 AS df,
      | CAST(floor((m1 - m2)
      |   / sqrt((ss1 + ss2) / CAST(n1 + n2 - 2 AS DOUBLE)
      |          * (1.0/CAST(n1 AS DOUBLE) + 1.0/CAST(n2 AS DOUBLE)))
      |   * 1e6) AS BIGINT) AS t6
      |FROM t""".stripMargin

  /** q_anomaly_mad: median-absolute-deviation outlier monitor per
    * event type — the robust dispersion ClickHouse spells
    * medianExact + a second pass (MAD resists the outliers stddev-based
    * z-scores are poisoned by). Both medians are RANK-SELECTED (the
    * value at row floor((n+1)/2) of the total order — q_percentile's
    * type-1 discipline, zero interpolation, all BIGINT cents), the
    * deviation pass reuses the group median via one broadcast-sized
    * join, and the outlier rule dev > 3·MAD is an integer comparison.
    * Two window sorts (value order, deviation order) keyed on the
    * group — no global sort anywhere. */
  def qAnomalyMad(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(F.col("event_type"), F.col("event_id"),
        (dec2(F.col("value")) * 100).cast("long").as("vc"))
    val w1 = Window.partitionBy("event_type").orderBy(F.col("vc").asc, F.col("event_id").asc)
    val cw = Window.partitionBy("event_type")
    val med = ev
      .withColumn("rn", F.row_number().over(w1))
      .withColumn("cnt", F.count(F.lit(1)).over(cw))
      .filter(F.col("rn") === F.floor((F.col("cnt") + 1) / 2))
      .select(F.col("event_type"), F.col("vc").as("med"))
    val dev = ev.join(med, "event_type")
      .withColumn("dev", F.abs(F.col("vc") - F.col("med")))
    val w2 = Window.partitionBy("event_type").orderBy(F.col("dev").asc, F.col("event_id").asc)
    val mad = dev
      .withColumn("rn2", F.row_number().over(w2))
      .withColumn("cnt2", F.count(F.lit(1)).over(cw))
      .filter(F.col("rn2") === F.floor((F.col("cnt2") + 1) / 2))
      .select(F.col("event_type"), F.col("dev").as("mad"))
    dev.join(mad, "event_type")
      .groupBy("event_type")
      .agg(F.count(F.lit(1)).as("n"),
        F.max("med").as("med_c"),
        F.max("mad").as("mad_c"),
        F.sum(F.when(F.col("dev") > F.col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"))
  }

  val qAnomalyMadSql: String =
    """WITH ev AS (
      |  SELECT event_type, event_id,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc
      |  FROM events),
      |r1 AS (
      |  SELECT event_type, vc,
      |   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vc ASC, event_id ASC) AS rn,
      |   COUNT(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM ev),
      |med AS (
      |  SELECT event_type, vc AS med FROM r1
      |  WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)),
      |dev AS (
      |  SELECT e.event_type, e.event_id, abs(e.vc - m.med) AS dev, m.med
      |  FROM ev e JOIN med m ON m.event_type = e.event_type),
      |r2 AS (
      |  SELECT event_type, dev,
      |   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev ASC, event_id ASC) AS rn2,
      |   COUNT(*) OVER (PARTITION BY event_type) AS cnt2
      |  FROM dev),
      |mad AS (
      |  SELECT event_type, dev AS mad FROM r2
      |  WHERE rn2 = CAST(floor((cnt2 + 1) / 2) AS BIGINT))
      |SELECT d.event_type, COUNT(*) AS n,
      | CAST(MAX(d.med) AS BIGINT) AS med_c,
      | CAST(MAX(a.mad) AS BIGINT) AS mad_c,
      | CAST(SUM(CASE WHEN d.dev > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad a ON a.event_type = d.event_type
      |GROUP BY 1""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_anomaly_mad", qAnomalyMad _, Some(qAnomalyMadSql)),
    ("q_studentt", qStudentT _, Some(qStudentTSql)),
    ("q_ttest", qTtest _, Some(qTtestSql)),
    ("q_skew_kurt", qSkewKurt _, Some(qSkewKurtSql)),
    ("q_linreg", qLinreg _, Some(qLinregSql)),
    ("q_mwu_auc", qMwuAuc _, Some(qMwuAucSql)),
    ("q_bitops", qBitops _, Some(qBitopsSql)),
    ("q_wmedian", qWMedian _, Some(qWMedianSql)),
    ("q_bounding_ratio", qBoundingRatio _, Some(qBoundingRatioSql)),
    ("q_max_intersections", qMaxIntersections _, Some(qMaxIntersectionsSql)))
}
