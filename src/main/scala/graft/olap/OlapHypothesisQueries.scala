package graft.olap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{functions => F}

import graft.Tables
import graft.Tables.dec2

/** Distribution-comparison and association statistics (ClickHouse
  * `kolmogorovSmirnovTest`, `rankCorr`, `entropy`, `contingency`,
  * `cramersVBiasCorrected`, `theilsU`, `sparkbar`).
  *
  * Same cross-engine float discipline as [[OlapAnalyticQueries]]:
  * aggregation state is exact (BIGINT / DECIMAL(38,0) rank sums, integer
  * cumulative counts, contingency cell counts); doubles appear only in a
  * terminal closed form written as the identical IEEE operation tree on
  * both engines. The one genuinely inexact primitive used here is log2,
  * whose last-ulp result is NOT guaranteed identical between java.lang.Math
  * and C libm — every log2 term is therefore floor(x*1e6 + 0.5)-rounded
  * (round-half-up) so a 1-ulp disagreement at an integer boundary (e.g.
  * log2 of a power of two) cannot flip the output, and the per-category
  * terms are rounded to BIGINT *before* summation so the sum is
  * order-independent.
  *
  * Scale shapes: KS and Spearman are one range-frame window sort per
  * group key (single exchange, no self-join); the entropy / association
  * family aggregates to a contingency table first (cells ≤ |r|·|c|, a
  * few dozen rows) so every log/chi² term runs on cell counts, never on
  * the fact stream; sparkbar's bounds row is a broadcast scalar.
  */
object OlapHypothesisQueries {
  type Q = (SparkSession, String) => DataFrame

  private val d38 = DecimalType(38, 0)
  private def d(c: String): Column = F.col(c).cast("double")

  /** Day-of-week group + click/purchase value-cents — the shared cohort
    * pairing of q_ttest / q_mwu_auc, reused so the hypothesis family is
    * directly comparable across tests. */
  private def cohort(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .filter(F.col("event_type").isin("click", "purchase"))
      .select(F.expr("unix_micros(ts) div 86400000000 % 7").as("g"),
        F.col("event_type").as("et"),
        (dec2(F.col("value")) * 100).cast("long").as("vc"))

  /** q_ks_test: ClickHouse `kolmogorovSmirnovTest` — two-sample exact KS
    * statistic per cohort day. D = max_v |F1(v) − F2(v)| is computed as a
    * pure integer: cumulative counts c1,c2 under a RANGE frame (ties
    * collapse identically on both engines because the frame includes all
    * peers of v), numerator max|c1·n2 − c2·n1|, then
    * d6 = floor(1e6·D) via DECIMAL division. lam6 is the asymptotic
    * scaling √(n1·n2/(n1+n2))·D (sqrt/division are correctly rounded —
    * deterministic). One window sort per day partition; no self-join.
    * Numerator stays in BIGINT for per-day sample sizes up to ~3e9 per
    * side (beyond any per-day cohort at 100 TB). */
  def qKsTest(s: SparkSession, dir: String): DataFrame = {
    val wv = Window.partitionBy("g").orderBy(F.col("vc"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy("g")
    val one = (et: String) => F.when(F.col("et") === et, 1L).otherwise(0L)
    // one select so Catalyst groups the four aggregates into two Window
    // nodes (one per spec) over a single exchange+sort, instead of the
    // four stacked Window nodes sequential withColumns produce
    val r = cohort(s, dir).select(F.col("g"),
      F.sum(one("click")).over(wv).as("c1"),
      F.sum(one("purchase")).over(wv).as("c2"),
      F.sum(one("click")).over(wg).as("n1"),
      F.sum(one("purchase")).over(wg).as("n2"))
    val m = r.groupBy("g").agg(
      F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))).as("dnum"),
      F.max("n1").as("n1"), F.max("n2").as("n2"))
      // a day with either sample empty has no defined D: filter it on BOTH
      // engines rather than diverge (Spark NULL vs DuckDB //0 error)
      .filter(F.col("n1") > 0L && F.col("n2") > 0L)
    m.select(F.col("g"), F.col("n1"), F.col("n2"), F.col("dnum"),
      F.expr("cast((cast(dnum as decimal(38,0)) * 1000000) div (cast(n1 as decimal(38,0)) * n2) as bigint)").as("d6"),
      F.floor(F.sqrt(d("n1") * d("n2") / (d("n1") + d("n2")))
        * (d("dnum") / (d("n1") * d("n2"))) * 1e6).as("lam6"))
  }

  val qKsTestSql: String =
    """WITH ev AS (
      |  SELECT epoch_us(ts) // 86400000000 % 7 AS g, event_type AS et,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc
      |  FROM events WHERE event_type IN ('click','purchase')),
      |r AS (
      |  SELECT g,
      |   SUM(CASE WHEN et='click' THEN 1 ELSE 0 END) OVER
      |     (PARTITION BY g ORDER BY vc RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
      |   SUM(CASE WHEN et='purchase' THEN 1 ELSE 0 END) OVER
      |     (PARTITION BY g ORDER BY vc RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
      |   SUM(CASE WHEN et='click' THEN 1 ELSE 0 END) OVER (PARTITION BY g) AS n1,
      |   SUM(CASE WHEN et='purchase' THEN 1 ELSE 0 END) OVER (PARTITION BY g) AS n2
      |  FROM ev),
      |m AS (
      |  SELECT g, CAST(MAX(ABS(c1*n2 - c2*n1)) AS BIGINT) AS dnum,
      |   CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2
      |  FROM r GROUP BY 1
      |  HAVING MAX(n1) > 0 AND MAX(n2) > 0)
      |SELECT g, n1, n2, dnum,
      | CAST((CAST(dnum AS HUGEINT) * 1000000) // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS d6,
      | CAST(floor(sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
      |   * (CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) * 1e6) AS BIGINT) AS lam6
      |FROM m""".stripMargin

  /** q_rankcorr: ClickHouse `rankCorr` — Spearman's rho between quantity
    * and extended price per return flag. Ties get the average rank; it is
    * kept integer by carrying 2× the average rank (2·rank + |peers| − 1,
    * the q_mwu_auc trick), which rescales numerator and denominator of
    * the Pearson form identically and thus cancels. All five sums
    * accumulate in DECIMAL(38,0) (rx2·ry2 ≤ 4n², so BIGINT would
    * overflow past n≈1.3e6 rows per group); the closed form is terminal
    * doubles (division / sqrt — correctly rounded). Two window sorts on
    * the same partition key = one exchange + two sorts, no self-join. */
  def qRankCorr(s: SparkSession, dir: String): DataFrame = {
    // 2·midrank = rank + #{≤v} (rank = #{<v}+1, so their sum is
    // #{<v} + #{≤v} + 1 = 2·average-rank): both terms share the same
    // (partition, order) spec — rank row-framed, the cumulative count
    // RANGE-framed — so each axis is ONE Window node over one sort, two
    // sorts total on a single exchange (the 2·rank + ties − 1 form needs
    // a second partition-by-(g,v) spec and doubles the sorts)
    val wx = Window.partitionBy("g").orderBy(F.col("x"))
    val wxc = wx.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wy = Window.partitionBy("g").orderBy(F.col("y"))
    val wyc = wy.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val r = Tables(s, dir, "lineitem")
      .select(F.col("l_returnflag").as("g"),
        F.col("l_quantity").cast("long").as("x"),
        (dec2(F.col("l_extendedprice")) * 100).cast("long").as("y"))
      .select(F.col("g"),
        (F.rank().over(wx).cast("long") + F.count(F.lit(1)).over(wxc)).as("rx2"),
        (F.rank().over(wy).cast("long") + F.count(F.lit(1)).over(wyc)).as("ry2"))
    val a = r.groupBy("g").agg(
      F.count(F.lit(1)).as("n"),
      F.sum(F.col("rx2").cast(d38)).as("sx"),
      F.sum(F.col("ry2").cast(d38)).as("sy"),
      F.sum(F.col("rx2").cast(d38) * F.col("ry2")).as("sxy"),
      F.sum(F.col("rx2").cast(d38) * F.col("rx2")).as("sxx"),
      F.sum(F.col("ry2").cast(d38) * F.col("ry2")).as("syy"))
    val num = (F.col("n").cast(d38) * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    val dxx = (F.col("n").cast(d38) * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    val dyy = (F.col("n").cast(d38) * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    // a group with a constant axis has no defined rho: emit NULL on BOTH
    // engines (Spark double/0 would give ±Infinity, DuckDB may differ)
    a.select(F.col("g"), F.col("n"),
      F.when(dxx > 0.0 && dyy > 0.0,
        F.floor(num / F.sqrt(dxx * dyy) * 1e6)).as("rho6"))
  }

  val qRankCorrSql: String =
    """WITH li AS (
      |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
      |   CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS y
      |  FROM lineitem),
      |r AS (
      |  SELECT g,
      |   CAST(RANK() OVER (PARTITION BY g ORDER BY x) AS BIGINT)
      |     + COUNT(*) OVER (PARTITION BY g ORDER BY x
      |         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rx2,
      |   CAST(RANK() OVER (PARTITION BY g ORDER BY y) AS BIGINT)
      |     + COUNT(*) OVER (PARTITION BY g ORDER BY y
      |         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ry2
      |  FROM li),
      |a AS (
      |  SELECT g, COUNT(*) AS n,
      |   SUM(CAST(rx2 AS HUGEINT)) AS sx, SUM(CAST(ry2 AS HUGEINT)) AS sy,
      |   SUM(CAST(rx2 AS HUGEINT)*ry2) AS sxy,
      |   SUM(CAST(rx2 AS HUGEINT)*rx2) AS sxx,
      |   SUM(CAST(ry2 AS HUGEINT)*ry2) AS syy
      |  FROM r GROUP BY 1)
      |SELECT g, n,
      | CASE WHEN CAST(CAST(n AS HUGEINT)*sxx - sx*sx AS DOUBLE) > 0
      |       AND CAST(CAST(n AS HUGEINT)*syy - sy*sy AS DOUBLE) > 0
      |  THEN CAST(floor(CAST(CAST(n AS HUGEINT)*sxy - sx*sy AS DOUBLE)
      |    / sqrt(CAST(CAST(n AS HUGEINT)*sxx - sx*sx AS DOUBLE)
      |         * CAST(CAST(n AS HUGEINT)*syy - sy*sy AS DOUBLE)) * 1e6) AS BIGINT)
      |  ELSE NULL END AS rho6
      |FROM a""".stripMargin

  /** floor(c·log2(c)·1e6 + 0.5) — the order-independent, 1-ulp-safe
    * entropy term (see class doc). */
  private def lgTerm(c: Column): Column =
    F.floor(c.cast("double") * F.log2(c.cast("double")) * 1e6 + 0.5)

  /** q_entropy: ClickHouse `entropy(event_type)` per cohort day. Shannon
    * entropy H = log2(n) − Σ cᵢ·log2(cᵢ) / n computed from the per-day
    * category counts (≤ |event_type| cells per day), with every log2 term
    * rounded to BIGINT before the (integer, order-independent) sum. */
  def qEntropy(s: SparkSession, dir: String): DataFrame = {
    val cell = Tables(s, dir, "events")
      .select(F.expr("unix_micros(ts) div 86400000000 % 7").as("g"),
        F.col("event_type").as("et"))
      .groupBy("g", "et").agg(F.count(F.lit(1)).as("c"))
    val a = cell.groupBy("g").agg(
      F.sum("c").as("n"), F.count(F.lit(1)).as("k"),
      F.sum(lgTerm(F.col("c"))).as("slg6"))
    a.select(F.col("g"), F.col("n"), F.col("k"), F.col("slg6"),
      F.floor((F.log2(d("n")) - (d("slg6") / 1e6) / d("n")) * 1e6 + 0.5).as("h6"))
  }

  val qEntropySql: String =
    """WITH cell AS (
      |  SELECT epoch_us(ts) // 86400000000 % 7 AS g, event_type AS et, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |a AS (
      |  SELECT g, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS k,
      |   CAST(SUM(CAST(floor(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS slg6
      |  FROM cell GROUP BY 1)
      |SELECT g, n, k, slg6,
      | CAST(floor((log2(CAST(n AS DOUBLE)) - (CAST(slg6 AS DOUBLE) / 1e6) / CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS h6
      |FROM a""".stripMargin

  /** The event_type × user-bucket contingency table with marginals —
    * shared by q_assoc_suite and q_theilsu. Cells ≤ |event_type|·nb; the
    * fact stream is touched exactly once (groupBy), everything after
    * runs on the cell table. */
  private def contingency(s: SparkSession, dir: String, nb: Int): DataFrame = {
    val cell = Tables(s, dir, "events")
      .select(F.col("event_type").as("r"), (F.col("user_id") % nb).as("c"))
      .groupBy("r", "c").agg(F.count(F.lit(1)).as("o"))
      .localCheckpoint()
    val rt = cell.groupBy("r").agg(F.sum("o").as("rt"))
    val ct = cell.groupBy("c").agg(F.sum("o").as("ct"))
    cell.join(rt, "r").join(ct, "c")
  }

  /** q_assoc_suite: ClickHouse `contingency` + `cramersVBiasCorrected` —
    * Pearson's contingency coefficient C = √(χ²/(χ²+n)) and the
    * Bergsma bias-corrected Cramér's V over event_type × user-id bucket.
    * χ² uses the q_cramers_v DECIMAL(38,0) scheme (per-cell
    * (o²·1e9) div (rt·ct), overflow-impossible); the correction
    * φ²c = max(0, φ² − (r−1)(c−1)/(n−1)) and the shrunken category
    * counts are terminal doubles. */
  def qAssocSuite(s: SparkSession, dir: String): DataFrame = {
    val S = 1000000000L
    val a = contingency(s, dir, 10).agg(
      F.sum(F.expr(
        s"(cast(o as decimal(38,0)) * o * $S) div (cast(rt as decimal(38,0)) * ct)")).as("t"),
      F.sum("o").as("n"),
      F.count_distinct(F.col("r")).as("nr"),
      F.count_distinct(F.col("c")).as("nc"))
    val chi2 = F.expr(s"cast(greatest(cast(0 as decimal(38,0)), cast(n as decimal(38,0)) * (t - $S)) as double)") / 1e9
    val phi2 = chi2 / d("n")
    val phi2c = F.greatest(F.lit(0.0),
      phi2 - (d("nr") - 1.0) * (d("nc") - 1.0) / (d("n") - 1.0))
    val rc = d("nr") - (d("nr") - 1.0) * (d("nr") - 1.0) / (d("n") - 1.0)
    val cc = d("nc") - (d("nc") - 1.0) * (d("nc") - 1.0) / (d("n") - 1.0)
    a.select(F.col("n"), F.col("nr"), F.col("nc"),
      F.floor(F.sqrt(chi2 / (chi2 + d("n"))) * 1e6).as("c6"),
      F.floor(F.sqrt(phi2c / F.least(rc - 1.0, cc - 1.0)) * 1e6).as("vc6"))
  }

  val qAssocSuiteSql: String =
    """WITH ev AS (SELECT event_type AS r, user_id % 10 AS c FROM events),
      |cell AS (SELECT r, c, COUNT(*) AS o FROM ev GROUP BY 1, 2),
      |rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rt FROM cell GROUP BY 1),
      |ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS ct FROM cell GROUP BY 1),
      |agg AS (
      |  SELECT CAST(SUM((CAST(o AS HUGEINT) * o * 1000000000)
      |                  // (CAST(rt.rt AS HUGEINT) * ct.ct)) AS BIGINT) AS t,
      |    CAST(SUM(o) AS BIGINT) AS n,
      |    COUNT(DISTINCT cell.r) AS nr, COUNT(DISTINCT cell.c) AS nc
      |  FROM cell JOIN rt ON rt.r = cell.r JOIN ct ON ct.c = cell.c),
      |f AS (
      |  SELECT n, nr, nc,
      |   CAST(greatest(CAST(0 AS HUGEINT), CAST(n AS HUGEINT) * (t - 1000000000)) AS DOUBLE) / 1e9 AS chi2
      |  FROM agg)
      |SELECT n, nr, nc,
      | CAST(floor(sqrt(chi2 / (chi2 + CAST(n AS DOUBLE))) * 1e6) AS BIGINT) AS c6,
      | CAST(floor(sqrt(
      |   greatest(0.0, chi2 / CAST(n AS DOUBLE)
      |     - (CAST(nr AS DOUBLE)-1.0)*(CAST(nc AS DOUBLE)-1.0)/(CAST(n AS DOUBLE)-1.0))
      |   / least(CAST(nr AS DOUBLE) - (CAST(nr AS DOUBLE)-1.0)*(CAST(nr AS DOUBLE)-1.0)/(CAST(n AS DOUBLE)-1.0) - 1.0,
      |           CAST(nc AS DOUBLE) - (CAST(nc AS DOUBLE)-1.0)*(CAST(nc AS DOUBLE)-1.0)/(CAST(n AS DOUBLE)-1.0) - 1.0))
      |   * 1e6) AS BIGINT) AS vc6
      |FROM f""".stripMargin

  /** q_theilsu: ClickHouse `theilsU` — the uncertainty coefficient
    * U(r|c) = (H(r) − H(r|c)) / H(r) of event_type given the user-id
    * bucket. The three entropy sums (row marginal, column marginal,
    * joint) use the same BIGINT-rounded log2 terms as q_entropy, taken
    * over the contingency cells; the identity
    * H(r|c) = H(r,c) − H(c) = (sct6 − sj6)/(1e6·n) makes the whole
    * statistic a function of (n, srt6, sct6, sj6) — four exact BIGINTs. */
  def qTheilsU(s: SparkSession, dir: String): DataFrame = {
    val cell = contingency(s, dir, 8)
    // rt/ct repeat per cell — de-duplicate marginal terms by summing the
    // per-cell term divided by the number of cells sharing the marginal:
    // instead aggregate marginals separately from the distinct sets.
    val rts = cell.select("r", "rt").distinct()
      .agg(F.sum(lgTerm(F.col("rt"))).as("srt6"))
    val cts = cell.select("c", "ct").distinct()
      .agg(F.sum(lgTerm(F.col("ct"))).as("sct6"))
    val js = cell.agg(F.sum(lgTerm(F.col("o"))).as("sj6"), F.sum("o").as("n"))
    val a = js.crossJoin(rts).crossJoin(cts)
    val hr = F.log2(d("n")) - (d("srt6") / 1e6) / d("n")
    val hrGivenC = (d("sct6") - d("sj6")) / 1e6 / d("n")
    // H(r)=0 (a single event type) leaves U undefined: NULL on both engines
    a.select(F.col("n"), F.col("srt6"), F.col("sct6"), F.col("sj6"),
      F.when(hr > 0.0, F.floor((hr - hrGivenC) / hr * 1e6 + 0.5)).as("u6"))
  }

  val qTheilsUSql: String =
    """WITH ev AS (SELECT event_type AS r, user_id % 8 AS c FROM events),
      |cell AS (SELECT r, c, COUNT(*) AS o FROM ev GROUP BY 1, 2),
      |rts AS (SELECT CAST(SUM(CAST(floor(CAST(rt AS DOUBLE)*log2(CAST(rt AS DOUBLE))*1e6 + 0.5) AS BIGINT)) AS BIGINT) AS srt6
      |        FROM (SELECT r, CAST(SUM(o) AS BIGINT) AS rt FROM cell GROUP BY 1)),
      |cts AS (SELECT CAST(SUM(CAST(floor(CAST(ct AS DOUBLE)*log2(CAST(ct AS DOUBLE))*1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sct6
      |        FROM (SELECT c, CAST(SUM(o) AS BIGINT) AS ct FROM cell GROUP BY 1)),
      |js AS (SELECT CAST(SUM(CAST(floor(CAST(o AS DOUBLE)*log2(CAST(o AS DOUBLE))*1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sj6,
      |        CAST(SUM(o) AS BIGINT) AS n FROM cell)
      |SELECT n, srt6, sct6, sj6,
      | CASE WHEN (log2(CAST(n AS DOUBLE)) - (CAST(srt6 AS DOUBLE)/1e6)/CAST(n AS DOUBLE)) > 0
      |  THEN CAST(floor(
      |   ((log2(CAST(n AS DOUBLE)) - (CAST(srt6 AS DOUBLE)/1e6)/CAST(n AS DOUBLE))
      |    - (CAST(sct6 AS DOUBLE) - CAST(sj6 AS DOUBLE))/1e6/CAST(n AS DOUBLE))
      |   / (log2(CAST(n AS DOUBLE)) - (CAST(srt6 AS DOUBLE)/1e6)/CAST(n AS DOUBLE))
      |   * 1e6 + 0.5) AS BIGINT)
      |  ELSE NULL END AS u6
      |FROM js CROSS JOIN rts CROSS JOIN cts""".stripMargin

  /** q_sparkbar: ClickHouse `sparkbar(16)(day, count)` — a 16-bucket
    * activity bar per event type over the table's full day range,
    * emitted as digit levels '0'..'8' (0 = empty bucket, else
    * 1 + (c−1)·8 div maxc — the same ceil-scaled 8-level quantisation
    * ClickHouse renders as block glyphs). Pure integer arithmetic; the
    * global day range is a 1-row broadcast scalar, bucket cells are
    * ≤ |event_type|·16 rows, and the dense 0..15 bucket axis comes from
    * an explode of a literal sequence (so empty buckets render as 0). */
  def qSparkbar(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(F.col("event_type").as("et"),
        F.expr("unix_micros(ts) div 86400000000").as("day"))
    val bounds = ev.agg(F.min("day").as("d0"), F.max("day").as("d1"))
    val b = ev.crossJoin(F.broadcast(bounds))
      .select(F.col("et"),
        F.expr("least(15, ((day - d0) * 16) div (d1 - d0 + 1))").as("bucket"))
      .groupBy("et", "bucket").agg(F.count(F.lit(1)).as("c"))
    val mx = b.groupBy("et").agg(F.max("c").as("maxc"))
    val axis = b.select("et").distinct()
      .select(F.col("et"), F.explode(F.sequence(F.lit(0L), F.lit(15L))).as("bucket"))
    val lvl = axis.join(b, Seq("et", "bucket"), "left")
      .join(mx, Seq("et"))
      .select(F.col("et"), F.col("bucket"),
        F.when(F.col("c").isNull, 0L)
          .otherwise(F.expr("(c - 1) * 8 div maxc + 1")).as("lvl"))
    lvl.groupBy("et").agg(
      F.concat_ws("", F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("bucket"), F.col("lvl")))),
        x => x.getField("lvl").cast("string"))).as("bar"))
  }

  val qSparkbarSql: String =
    """WITH ev AS (
      |  SELECT event_type AS et, epoch_us(ts) // 86400000000 AS day FROM events),
      |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
      |b AS (
      |  SELECT et, least(15, ((day - d0) * 16) // (d1 - d0 + 1)) AS bucket, COUNT(*) AS c
      |  FROM ev CROSS JOIN bounds GROUP BY 1, 2),
      |mx AS (SELECT et, MAX(c) AS maxc FROM b GROUP BY 1),
      |axis AS (SELECT DISTINCT et, CAST(u.bucket AS BIGINT) AS bucket
      |         FROM b, UNNEST(range(0, 16)) AS u(bucket)),
      |lvl AS (
      |  SELECT axis.et, axis.bucket,
      |   CASE WHEN b.c IS NULL THEN 0 ELSE CAST((b.c - 1) * 8 // mx.maxc + 1 AS BIGINT) END AS lvl
      |  FROM axis LEFT JOIN b ON b.et = axis.et AND b.bucket = axis.bucket
      |  JOIN mx ON mx.et = axis.et)
      |SELECT et, string_agg(CAST(lvl AS VARCHAR), '' ORDER BY bucket) AS bar
      |FROM lvl GROUP BY 1""".stripMargin

  /** q_psi_drift: Population Stability Index — the standard
    * training-data drift metric — of each cohort day's value
    * distribution against the event type's overall distribution, over 16
    * equal-width buckets with add-one smoothing (so empty buckets are
    * defined on both engines). PSI = Σ_b (p_b − q_b)·ln(p_b/q_b); p and
    * q are correctly-rounded quotients of exact integers, and each ln
    * term is rounded to BIGINT (×1e9, half-up) before the
    * order-independent integer sum — the same 1-ulp discipline as the
    * entropy family. The fact stream is aggregated once to
    * (et, day, bucket) cells; day totals, overall-bucket totals and the
    * 5-row min/max bounds are cell-level joins (bounds broadcast). */
  def qPsiDrift(s: SparkSession, dir: String): DataFrame = {
    val B = 16
    val ev = Tables(s, dir, "events")
      .select(F.col("event_type").as("et"),
        F.expr("unix_micros(ts) div 86400000000 % 7").as("g"),
        (dec2(F.col("value")) * 100).cast("long").as("vc"))
    val bounds = ev.groupBy("et").agg(F.min("vc").as("mn"), F.max("vc").as("mx"))
    val cell = ev.join(F.broadcast(bounds), "et")
      .select(F.col("et"), F.col("g"),
        F.expr(s"least(${B - 1}, ((vc - mn) * $B) div (mx - mn + 1))").as("bucket"))
      .groupBy("et", "g", "bucket").agg(F.count(F.lit(1)).as("c"))
      .localCheckpoint()
    val ng = cell.groupBy("et", "g").agg(F.sum("c").as("ng"))
    val ct = cell.groupBy("et", "bucket").agg(F.sum("c").as("ct"))
    val nt = cell.groupBy("et").agg(F.sum("c").as("nt"))
    // dense (et, g, bucket) axis so empty day-buckets contribute their
    // smoothed term too (DuckDB's cross of distinct ets/days × range)
    val axis = ng.select("et", "g")
      .select(F.col("et"), F.col("g"),
        F.explode(F.sequence(F.lit(0L), F.lit((B - 1).toLong))).as("bucket"))
    val j = axis.join(cell, Seq("et", "g", "bucket"), "left")
      .na.fill(0L, Seq("c"))
      .join(ng, Seq("et", "g")).join(ct, Seq("et", "bucket")).join(nt, Seq("et"))
    val p = (F.col("c") + 1L).cast("double") / (F.col("ng") + B).cast("double")
    val q = (F.col("ct") + 1L).cast("double") / (F.col("nt") + B).cast("double")
    val term = F.floor((p - q) * F.log(p / q) * 1e9 + 0.5)
    j.groupBy("et", "g").agg(F.sum(term).as("psi9"))
  }

  val qPsiDriftSql: String =
    """WITH ev AS (
      |  SELECT event_type AS et, epoch_us(ts) // 86400000000 % 7 AS g,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc
      |  FROM events),
      |bounds AS (SELECT et, MIN(vc) AS mn, MAX(vc) AS mx FROM ev GROUP BY 1),
      |cell AS (
      |  SELECT ev.et, g, least(15, ((vc - mn) * 16) // (mx - mn + 1)) AS bucket, COUNT(*) AS c
      |  FROM ev JOIN bounds ON bounds.et = ev.et GROUP BY 1, 2, 3),
      |ng AS (SELECT et, g, CAST(SUM(c) AS BIGINT) AS ng FROM cell GROUP BY 1, 2),
      |ct AS (SELECT et, bucket, CAST(SUM(c) AS BIGINT) AS ct FROM cell GROUP BY 1, 2),
      |nt AS (SELECT et, CAST(SUM(c) AS BIGINT) AS nt FROM cell GROUP BY 1),
      |axis AS (SELECT et, g, CAST(u.bucket AS BIGINT) AS bucket
      |         FROM ng, UNNEST(range(0, 16)) AS u(bucket)),
      |j AS (
      |  SELECT axis.et, axis.g, axis.bucket, COALESCE(cell.c, 0) AS c, ng.ng, ct.ct, nt.nt
      |  FROM axis LEFT JOIN cell ON cell.et = axis.et AND cell.g = axis.g AND cell.bucket = axis.bucket
      |  JOIN ng ON ng.et = axis.et AND ng.g = axis.g
      |  JOIN ct ON ct.et = axis.et AND ct.bucket = axis.bucket
      |  JOIN nt ON nt.et = axis.et),
      |t AS (
      |  SELECT et, g,
      |   CAST(floor((CAST(c+1 AS DOUBLE)/CAST(ng+16 AS DOUBLE)
      |              - CAST(ct+1 AS DOUBLE)/CAST(nt+16 AS DOUBLE))
      |     * ln((CAST(c+1 AS DOUBLE)/CAST(ng+16 AS DOUBLE))
      |        / (CAST(ct+1 AS DOUBLE)/CAST(nt+16 AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS term
      |  FROM j)
      |SELECT et, g, CAST(SUM(term) AS BIGINT) AS psi9 FROM t GROUP BY 1, 2""".stripMargin

  /** q_iv_woe: ClickHouse `categoricalInformationValue` — Weight of
    * Evidence and Information Value of the user-id bucket feature
    * against the binary purchase outcome, with add-one smoothing so
    * empty cells are defined. good/bad counts are exact BIGINTs from one
    * fact-stream aggregation; WOE = ln((g_i/G)/(b_i/B)) is rounded to
    * BIGINT per category (1-ulp-safe), and IV = Σ (g_i/G − b_i/B)·WOE_i
    * sums BIGINT-rounded terms (order-independent), attached to every
    * row from the ≤10-row cell aggregate (broadcast). */
  def qIvWoe(s: SparkSession, dir: String): DataFrame = {
    val cell = Tables(s, dir, "events")
      .select((F.col("user_id") % 10).as("cat"),
        F.when(F.col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy("cat")
      .agg(F.sum("y").as("good"), F.sum(F.lit(1L) - F.col("y")).as("bad"))
      .localCheckpoint()
    val tot = cell.agg(F.sum("good").as("gt"), F.sum("bad").as("bt"),
      F.count(F.lit(1)).as("k"))
    val j = cell.crossJoin(F.broadcast(tot))
    val pg = (F.col("good") + 1L).cast("double") / (F.col("gt") + F.col("k")).cast("double")
    val pb = (F.col("bad") + 1L).cast("double") / (F.col("bt") + F.col("k")).cast("double")
    val woe6 = F.floor(F.log(pg / pb) * 1e6 + 0.5)
    val term9 = F.floor((pg - pb) * F.log(pg / pb) * 1e9 + 0.5)
    val terms = j.select(F.col("cat"), F.col("good"), F.col("bad"),
      woe6.as("woe6"), term9.as("term9"))
    val iv = terms.agg(F.sum("term9").as("iv9"))
    terms.drop("term9").crossJoin(F.broadcast(iv))
  }

  val qIvWoeSql: String =
    """WITH ev AS (
      |  SELECT user_id % 10 AS cat,
      |   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |cell AS (
      |  SELECT cat, CAST(SUM(y) AS BIGINT) AS good,
      |   CAST(SUM(1 - y) AS BIGINT) AS bad
      |  FROM ev GROUP BY 1),
      |tot AS (SELECT CAST(SUM(good) AS BIGINT) AS gt, CAST(SUM(bad) AS BIGINT) AS bt,
      |        COUNT(*) AS k FROM cell),
      |t AS (
      |  SELECT cat, good, bad,
      |   CAST(floor(ln((CAST(good+1 AS DOUBLE)/CAST(gt+k AS DOUBLE))
      |               / (CAST(bad+1 AS DOUBLE)/CAST(bt+k AS DOUBLE))) * 1e6 + 0.5) AS BIGINT) AS woe6,
      |   CAST(floor((CAST(good+1 AS DOUBLE)/CAST(gt+k AS DOUBLE)
      |             - CAST(bad+1 AS DOUBLE)/CAST(bt+k AS DOUBLE))
      |     * ln((CAST(good+1 AS DOUBLE)/CAST(gt+k AS DOUBLE))
      |        / (CAST(bad+1 AS DOUBLE)/CAST(bt+k AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS term9
      |  FROM cell CROSS JOIN tot)
      |SELECT cat, good, bad, woe6,
      | (SELECT CAST(SUM(term9) AS BIGINT) FROM t) AS iv9
      |FROM t""".stripMargin

  /** q_meanztest: ClickHouse `meanZTest` — two-sample z on the q_ttest
    * cohort under the given population variances (σ² = 250000 cents² per
    * side, the test's parameters, as ClickHouse takes them as
    * arguments). Exact BIGINT sums; z = (m1−m2)/√(σ²/n1 + σ²/n2) is a
    * correctly-rounded terminal tree — no libm beyond sqrt. */
  def qMeanZTest(s: SparkSession, dir: String): DataFrame = {
    val V = 250000.0
    val agg = cohort(s, dir)
      .groupBy("g")
      .agg(
        F.count(F.when(F.col("et") === "click", 1)).as("n1"),
        F.sum(F.when(F.col("et") === "click", F.col("vc")).otherwise(0L)).as("s1"),
        F.count(F.when(F.col("et") === "purchase", 1)).as("n2"),
        F.sum(F.when(F.col("et") === "purchase", F.col("vc")).otherwise(0L)).as("s2"))
      .filter(F.col("n1") > 0L && F.col("n2") > 0L) // z undefined on an empty side
    agg.select(F.col("g"), F.col("n1"), F.col("n2"),
      F.floor((d("s1") / d("n1") - d("s2") / d("n2"))
        / F.sqrt(F.lit(V) / d("n1") + F.lit(V) / d("n2")) * 1e6).as("z6"))
  }

  val qMeanZTestSql: String =
    """WITH ev AS (
      |  SELECT epoch_us(ts) // 86400000000 % 7 AS g, event_type AS et,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc
      |  FROM events WHERE event_type IN ('click','purchase')),
      |m AS (
      |  SELECT g,
      |   COUNT(CASE WHEN et = 'click' THEN 1 END) AS n1,
      |   CAST(SUM(CASE WHEN et = 'click' THEN vc ELSE 0 END) AS BIGINT) AS s1,
      |   COUNT(CASE WHEN et = 'purchase' THEN 1 END) AS n2,
      |   CAST(SUM(CASE WHEN et = 'purchase' THEN vc ELSE 0 END) AS BIGINT) AS s2
      |  FROM ev GROUP BY 1
      |  HAVING COUNT(CASE WHEN et = 'click' THEN 1 END) > 0
      |     AND COUNT(CASE WHEN et = 'purchase' THEN 1 END) > 0)
      |SELECT g, n1, n2,
      | CAST(floor((CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE))
      |   / sqrt(250000.0/CAST(n1 AS DOUBLE) + 250000.0/CAST(n2 AS DOUBLE)) * 1e6) AS BIGINT) AS z6
      |FROM m""".stripMargin

  /** q_chi2_gof: one-sample chi² goodness-of-fit of the per-day
    * event-type mix against the uniform expectation n/k — entirely in
    * integers: per-cell term (o·k − n)²·1e9 div (n·k²) accumulated in
    * DECIMAL(38,0) (χ² = Σ(o−n/k)²/(n/k) scaled by 1e9), so there is no
    * float anywhere and overflow is impossible below DECIMAL38 bounds. */
  def qChi2Gof(s: SparkSession, dir: String): DataFrame = {
    val cell = Tables(s, dir, "events")
      .select(F.expr("unix_micros(ts) div 86400000000 % 7").as("g"),
        F.col("event_type").as("et"))
      .groupBy("g", "et").agg(F.count(F.lit(1)).as("o"))
    val tot = cell.groupBy("g").agg(F.sum("o").as("n"), F.count(F.lit(1)).as("k"))
    cell.join(tot, "g")
      .groupBy("g")
      .agg(F.max("n").as("n"), F.max("k").as("k"),
        F.sum(F.expr(
          """(cast(o as decimal(38,0)) * k - n) * (cast(o as decimal(38,0)) * k - n) * 1000000000
            |  div (cast(n as decimal(38,0)) * k * k)""".stripMargin))
          .cast("long").as("chi2s9"))
  }

  val qChi2GofSql: String =
    """WITH cell AS (
      |  SELECT epoch_us(ts) // 86400000000 % 7 AS g, event_type AS et, COUNT(*) AS o
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT g, CAST(SUM(o) AS BIGINT) AS n, COUNT(*) AS k FROM cell GROUP BY 1)
      |SELECT cell.g, MAX(n) AS n, MAX(k) AS k,
      | CAST(SUM((CAST(o AS HUGEINT) * k - n) * (CAST(o AS HUGEINT) * k - n) * 1000000000
      |          // (CAST(n AS HUGEINT) * k * k)) AS BIGINT) AS chi2s9
      |FROM cell JOIN tot ON tot.g = cell.g GROUP BY 1""".stripMargin

  /** q_covar_suite: ClickHouse `covarPop` / `covarSamp` / `avgWeighted` —
    * quantity-price covariance and the quantity-weighted mean price per
    * return flag. One partial-aggregatable pass of exact sums (Σxy in
    * DECIMAL(38,0): x ≤ 50, y ≤ 1e7 cents ⇒ BIGINT-safe only to ~1.8e10
    * rows/group, DECIMAL is unconditional); terminal doubles with the
    * identical division/subtraction tree on both engines, floor-scaled. */
  def qCovarSuite(s: SparkSession, dir: String): DataFrame = {
    val a = Tables(s, dir, "lineitem")
      .select(F.col("l_returnflag").as("g"),
        F.col("l_quantity").cast("long").as("x"),
        (dec2(F.col("l_extendedprice")) * 100).cast("long").as("y"))
      .groupBy("g")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum("x").as("sx"),
        F.sum(F.col("y").cast(d38)).as("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).as("sxy"))
    val covp = (F.col("sxy").cast("double")
      - F.col("sx").cast("double") * F.col("sy").cast("double") / d("n")) / d("n")
    val covs = (F.col("sxy").cast("double")
      - F.col("sx").cast("double") * F.col("sy").cast("double") / d("n")) /
      (d("n") - 1.0)
    a.filter(F.col("n") > 1L) // covarSamp needs n ≥ 2
      .select(F.col("g"), F.col("n"),
        F.floor(covp * 100).as("covp2"),
        F.floor(covs * 100).as("covs2"),
        F.floor(F.col("sxy").cast("double") / F.col("sx").cast("double") * 100).as("wavg2"))
  }

  val qCovarSuiteSql: String =
    """WITH li AS (
      |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
      |   CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS y
      |  FROM lineitem),
      |a AS (
      |  SELECT g, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |   SUM(CAST(y AS HUGEINT)) AS sy, SUM(CAST(x AS HUGEINT)*y) AS sxy
      |  FROM li GROUP BY 1 HAVING COUNT(*) > 1)
      |SELECT g, n,
      | CAST(floor((CAST(sxy AS DOUBLE)
      |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) * 100) AS BIGINT) AS covp2,
      | CAST(floor((CAST(sxy AS DOUBLE)
      |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) * 100) AS BIGINT) AS covs2,
      | CAST(floor(CAST(sxy AS DOUBLE) / CAST(sx AS DOUBLE) * 100) AS BIGINT) AS wavg2
      |FROM a""".stripMargin

  /** q_table_stats: the ANALYZE TABLE / column-statistics pass every
    * cost-based optimizer (and ClickHouse's `system.columns`-style
    * introspection) needs: per-column row count, exact NDV, min/max and
    * null count for a column set, in ONE aggregation pass. The three
    * exact count-distincts ride Spark's Expand (row ×3 — the standard
    * ANALYZE plan shape, map-side partial-aggregated); min/max/nulls are
    * plain partials. Emitted long-typed (quantity in whole units, price
    * in cents) so the stats row is engine-exact. */
  def qTableStats(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .select(F.col("l_returnflag").as("rf"), F.col("l_linestatus").as("ls"),
        F.col("l_quantity").cast("long").as("qty"),
        (dec2(F.col("l_extendedprice")) * 100).cast("long").as("pc"))
      .agg(F.count(F.lit(1)).as("n"),
        F.count_distinct(F.col("rf")).as("ndv_rf"),
        F.count_distinct(F.col("ls")).as("ndv_ls"),
        F.count_distinct(F.col("qty")).as("ndv_qty"),
        F.min("qty").as("qty_min"), F.max("qty").as("qty_max"),
        F.min("pc").as("pc_min"), F.max("pc").as("pc_max"),
        F.sum(F.col("pc").isNull.cast("long")).as("pc_nulls"))

  val qTableStatsSql: String =
    """SELECT COUNT(*) AS n,
      | COUNT(DISTINCT l_returnflag) AS ndv_rf,
      | COUNT(DISTINCT l_linestatus) AS ndv_ls,
      | COUNT(DISTINCT CAST(l_quantity AS BIGINT)) AS ndv_qty,
      | CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_min,
      | CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_max,
      | CAST(MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS pc_min,
      | CAST(MAX(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS pc_max,
      | CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS pc_nulls
      |FROM lineitem""".stripMargin

  /** q_anova: one-way ANOVA (ClickHouse `analysisOfVariance`) of
    * value-cents across ALL event types, per day-of-week cohort — the
    * k-sample generalization of q_ttest/q_studentt. Aggregation state is
    * exact: per (cohort, type) cell one pass yields n/Σv/Σv² in BIGINT
    * (the q_ttest headroom argument), the between/within sums of squares
    * come from per-cell floor divisions tᵢ = sᵢ² div nᵢ done in
    * DECIMAL(38,0)/HUGEINT and floored to BIGINT BEFORE the cell sum (so
    * the sum is order-invariant and engine-identical; each floor loses
    * < 1 cent², deterministic on both engines): SSB = Σtᵢ − S² div N,
    * SSW = Σqᵢ − Σtᵢ. η²-ppm is a pure integer division; only the final
    * F-statistic runs in doubles — one fixed IEEE tree over exact
    * integers (the file-header discipline), floor-scaled ×1e6. */
  def qAnova(s: SparkSession, dir: String): DataFrame = {
    val cell = Tables(s, dir, "events")
      .select(F.expr("unix_micros(ts) div 86400000000 % 7").as("g"),
        F.col("event_type").as("et"),
        (dec2(F.col("value")) * 100).cast("long").as("vc"))
      .groupBy("g", "et")
      .agg(F.count(F.lit(1)).as("cn"), F.sum("vc").as("sv"),
        F.sum(F.col("vc") * F.col("vc")).as("qv"))
    cell.groupBy("g")
      .agg(F.count(F.lit(1)).as("k"), F.sum("cn").as("n"),
        F.sum("sv").as("sv"), F.sum("qv").as("qv"),
        F.sum(F.expr("cast(sv as decimal(38,0)) * sv div cn")).as("t"))
      .filter(F.col("k") > 1L && F.col("n") > F.col("k"))
      .select(F.col("g"), F.col("k"), F.col("n"),
        (F.col("t") - F.expr("cast(sv as decimal(38,0)) * sv div n")).as("ssb"),
        (F.col("qv") - F.col("t")).as("ssw"))
      .select(F.col("g"), F.col("k"), F.col("n"), F.col("ssb"), F.col("ssw"),
        F.expr("cast(ssb as decimal(38,0)) * 1000000 div (ssb + ssw)").as("eta6"),
        F.floor(d("ssb") * (d("n") - d("k")) / (d("ssw") * (d("k") - F.lit(1.0)))
          * 1e6).as("f6"))
  }

  val qAnovaSql: String =
    """WITH ev AS (
      |  SELECT epoch_us(ts) // 86400000000 % 7 AS g, event_type AS et,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc
      |  FROM events),
      |cell AS (
      |  SELECT g, et, COUNT(*) AS cn, CAST(SUM(vc) AS BIGINT) AS sv,
      |   CAST(SUM(vc*vc) AS BIGINT) AS qv
      |  FROM ev GROUP BY 1, 2),
      |a AS (
      |  SELECT g, COUNT(*) AS k, CAST(SUM(cn) AS BIGINT) AS n,
      |   CAST(SUM(sv) AS BIGINT) AS sv, CAST(SUM(qv) AS BIGINT) AS qv,
      |   CAST(SUM(CAST((CAST(sv AS HUGEINT) * sv) // cn AS BIGINT)) AS BIGINT) AS t
      |  FROM cell GROUP BY 1
      |  HAVING COUNT(*) > 1 AND SUM(cn) > COUNT(*)),
      |ss AS (
      |  SELECT g, k, n,
      |   CAST(t - CAST((CAST(sv AS HUGEINT) * sv) // n AS BIGINT) AS BIGINT) AS ssb,
      |   CAST(qv - t AS BIGINT) AS ssw
      |  FROM a)
      |SELECT g, k, n, ssb, ssw,
      | CAST((CAST(ssb AS HUGEINT) * 1000000) // (ssb + ssw) AS BIGINT) AS eta6,
      | CAST(floor(CAST(ssb AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
      |   / (CAST(ssw AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)) * 1e6) AS BIGINT) AS f6
      |FROM ss""".stripMargin

  /** q_kendall: Kendall rank correlation between the DAILY cents series
    * of every unordered event-type pair — the concordance companion to
    * q_rankcorr (Spearman) and q_trend_mk (whose S statistic is Kendall
    * vs time). The day×type grid is calendar-complete (absent cells
    * COALESCE to 0 so both engines see the same series); the day-pair
    * fan-out is |types|²/2 × |days|²/2 — CALENDAR-bounded like
    * q_trend_mk's pair join, never fact-table-sized (at multi-year scale
    * the same per-year sub-partition refinement applies). Concordant /
    * discordant / tie counts are exact BIGINT sign compares; τ-a is a
    * pure integer floor-div (both engines truncate toward zero on the
    * possibly-negative numerator); τ-b's square root runs as one fixed
    * IEEE tree over the exact tie-adjusted counts, floor-scaled ×1e6. */
  def qKendall(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(F.expr("unix_micros(ts) div 86400000000").as("day"),
        F.col("event_type").as("et"),
        (dec2(F.col("value")) * 100).cast("long").as("vc"))
    // ONE fact-table pass: the day/type domains come off the daily
    // rollup (calendar × type sized), not a second events scan
    val daily = ev.groupBy("day", "et").agg(F.sum("vc").as("c")).localCheckpoint()
    val grid = daily.select("day").distinct()
      .crossJoin(daily.select("et").distinct())
      .join(daily, Seq("day", "et"), "left")
      .select(F.col("day"), F.col("et"),
        F.coalesce(F.col("c"), F.lit(0L)).as("c"))
    // both self-joins rename one side's columns first (the .as alias form
    // resolves equality keys to one attribute id → trivially-true WARN)
    val gridB = grid.select(F.col("day"), F.col("et").as("et_b"),
      F.col("c").as("c_b"))
    val cells = grid.join(gridB, Seq("day"))
      .filter(F.col("et") < F.col("et_b"))
      .select(F.col("et").as("t1"), F.col("et_b").as("t2"),
        F.col("day"), F.col("c").as("x"), F.col("c_b").as("y"))
    val cellsJ = cells.select(F.col("t1"), F.col("t2"),
      F.col("day").as("day_j"), F.col("x").as("x_j"), F.col("y").as("y_j"))
    val pp = cells.join(cellsJ, Seq("t1", "t2"))
      .filter(F.col("day") < F.col("day_j"))
      .select(F.col("t1"), F.col("t2"),
        (F.col("x_j") - F.col("x")).as("dx"),
        (F.col("y_j") - F.col("y")).as("dy"))
    pp.groupBy("t1", "t2")
      .agg(F.count(F.lit(1)).as("np"),
        F.sum(F.when((F.col("dx") > 0L && F.col("dy") > 0L)
          || (F.col("dx") < 0L && F.col("dy") < 0L), 1L).otherwise(0L)).as("conc"),
        F.sum(F.when((F.col("dx") > 0L && F.col("dy") < 0L)
          || (F.col("dx") < 0L && F.col("dy") > 0L), 1L).otherwise(0L)).as("disc"),
        F.sum(F.when(F.col("dx") === 0L && F.col("dy") =!= 0L, 1L).otherwise(0L)).as("tx"),
        F.sum(F.when(F.col("dy") === 0L && F.col("dx") =!= 0L, 1L).otherwise(0L)).as("ty"),
        F.sum(F.when(F.col("dx") === 0L && F.col("dy") === 0L, 1L).otherwise(0L)).as("txy"))
      .filter(F.col("np") > (F.col("tx") + F.col("txy"))
        && F.col("np") > (F.col("ty") + F.col("txy")))
      .select(F.col("t1"), F.col("t2"), F.col("np"), F.col("conc"),
        F.col("disc"), F.col("tx"), F.col("ty"), F.col("txy"),
        F.expr("(1000000 * (conc - disc)) div np").as("taua6"),
        F.floor((d("conc") - d("disc"))
          / F.sqrt((d("np") - d("tx") - d("txy")) * (d("np") - d("ty") - d("txy")))
          * 1e6).as("taub6"))
  }

  val qKendallSql: String =
    """WITH ev AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, event_type AS et,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc
      |  FROM events),
      |daily AS (SELECT day, et, CAST(SUM(vc) AS BIGINT) AS c FROM ev GROUP BY 1, 2),
      |grid AS (
      |  SELECT d.day, t.et, COALESCE(daily.c, 0) AS c
      |  FROM (SELECT DISTINCT day FROM ev) d
      |  CROSS JOIN (SELECT DISTINCT et FROM ev) t
      |  LEFT JOIN daily ON daily.day = d.day AND daily.et = t.et),
      |cells AS (
      |  SELECT a.et AS t1, b.et AS t2, a.day AS day, a.c AS x, b.c AS y
      |  FROM grid a JOIN grid b ON a.day = b.day AND a.et < b.et),
      |pp AS (
      |  SELECT i.t1, i.t2, j.x - i.x AS dx, j.y - i.y AS dy
      |  FROM cells i JOIN cells j
      |   ON i.t1 = j.t1 AND i.t2 = j.t2 AND i.day < j.day),
      |k AS (
      |  SELECT t1, t2, COUNT(*) AS np,
      |   CAST(SUM(CASE WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0) THEN 1 ELSE 0 END) AS BIGINT) AS conc,
      |   CAST(SUM(CASE WHEN (dx > 0 AND dy < 0) OR (dx < 0 AND dy > 0) THEN 1 ELSE 0 END) AS BIGINT) AS disc,
      |   CAST(SUM(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
      |   CAST(SUM(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty,
      |   CAST(SUM(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS txy
      |  FROM pp GROUP BY 1, 2)
      |SELECT t1, t2, np, conc, disc, tx, ty, txy,
      | (1000000 * (conc - disc)) // np AS taua6,
      | CAST(floor((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
      |   / sqrt((CAST(np AS DOUBLE) - CAST(tx AS DOUBLE) - CAST(txy AS DOUBLE))
      |     * (CAST(np AS DOUBLE) - CAST(ty AS DOUBLE) - CAST(txy AS DOUBLE))) * 1e6) AS BIGINT) AS taub6
      |FROM k
      |WHERE np > tx + txy AND np > ty + txy""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_anova", qAnova _, Some(qAnovaSql)),
    ("q_kendall", qKendall _, Some(qKendallSql)),
    ("q_table_stats", qTableStats _, Some(qTableStatsSql)),
    ("q_covar_suite", qCovarSuite _, Some(qCovarSuiteSql)),
    ("q_meanztest", qMeanZTest _, Some(qMeanZTestSql)),
    ("q_chi2_gof", qChi2Gof _, Some(qChi2GofSql)),
    ("q_iv_woe", qIvWoe _, Some(qIvWoeSql)),
    ("q_psi_drift", qPsiDrift _, Some(qPsiDriftSql)),
    ("q_ks_test", qKsTest _, Some(qKsTestSql)),
    ("q_rankcorr", qRankCorr _, Some(qRankCorrSql)),
    ("q_entropy", qEntropy _, Some(qEntropySql)),
    ("q_assoc_suite", qAssocSuite _, Some(qAssocSuiteSql)),
    ("q_theilsu", qTheilsU _, Some(qTheilsUSql)),
    ("q_sparkbar", qSparkbar _, Some(qSparkbarSql)))
}
