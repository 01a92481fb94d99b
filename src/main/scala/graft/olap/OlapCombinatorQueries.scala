package graft.olap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

import graft.Tables
import graft.Tables.{dec2, out2}

/** ClickHouse-style aggregate combinators and row-shaping modifiers the
  * reference's deployments rely on: conditional aggregates (`sumIf` /
  * `countIf` / `avgIf`), `LIMIT n BY`, pivoted cross-tabs, histogram
  * bucketing, `neighbor`/lag-lead row access, and `groupUniqArray`.
  *
  * All are single partial-aggregatable passes or one window sort — no
  * shape here adds a shuffle beyond its grouping key, so each holds at
  * any scale factor unchanged.
  */
object OlapCombinatorQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q_condagg: ClickHouse -If combinators in one grouped pass —
    * countIf/sumIf/avgIf(value > 50) per event type, next to the
    * unconditional aggregates. Conditional aggregation beats a
    * filter+join-back: one scan, partial-aggregated map-side. avg is a
    * single division of the exact decimal sum by the count (bit-identical
    * across engines; NULL for empty groups). */
  def qCondAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy("event_type")
      .agg(
        F.count(F.lit(1)).as("n"),
        F.sum(F.when(F.col("value") > 50.0, 1L).otherwise(0L)).as("n_big"),
        F.sum(F.when(F.col("value") > 50.0, dec2(F.col("value")))).as("sum_big_d"))
      .select(F.col("event_type"), F.col("n"), F.col("n_big"),
        out2(F.col("sum_big_d")).as("sum_big"),
        F.when(F.col("n_big") > 0L,
          out2(F.col("sum_big_d")) / F.col("n_big").cast("double")).as("avg_big"))

  val qCondAggSql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(COUNT(*) FILTER (WHERE value > 50.0) AS BIGINT) AS n_big,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE value > 50.0) AS DECIMAL(18,2)) AS DOUBLE) AS sum_big,
      | CASE WHEN COUNT(*) FILTER (WHERE value > 50.0) > 0 THEN
      |   CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE value > 50.0) AS DECIMAL(18,2)) AS DOUBLE)
      |     / CAST(COUNT(*) FILTER (WHERE value > 50.0) AS DOUBLE)
      | END AS avg_big
      |FROM events GROUP BY 1""".stripMargin

  private val EventTypes = Seq("click", "view", "purchase", "signup", "error")

  /** q_pivot: day × event-type cross-tab (counts). Explicit pivot values
    * keep this a single pass (no distinct-scan to discover columns — at
    * 100 TB that discovery scan matters); missing cells coalesce to 0. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(F.date_format(F.col("ts"), "yyyy-MM-dd").as("day"), F.col("event_type"))
      .groupBy("day").pivot("event_type", EventTypes).agg(F.count(F.lit(1)))
      .select(F.col("day") +: EventTypes.map(t =>
        F.coalesce(F.col(t), F.lit(0L)).as(t)): _*)

  val qPivotSql: String = {
    val cells = EventTypes.map(t =>
      s"CAST(COUNT(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS \"$t\"").mkString(",\n ")
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
       | $cells
       |FROM events GROUP BY 1""".stripMargin
  }

  /** q_group_concat: ClickHouse `groupConcat`/`arrayStringConcat` — each
    * user's first 8 event types in time order as one comma string. The
    * ordered list rides the bounded-heap TopKPairs aggregate (score =
    * −tu: min-8-by-time), so per-group state is 8 entries however long
    * the stream — collect_list + sort would buffer every row. The csv
    * assembly is a per-group post-aggregation map. */
  def qGroupConcat(s: SparkSession, dir: String): DataFrame = {
    // TopKPairs ranks (score DESC, id ASC): score = −tu picks the earliest
    // 8; the id packs (event_id, dictionary code) as event_id·8+code, so
    // equal timestamps tie-break by event_id — exactly the oracle's
    // ROW_NUMBER order (code < 8 never perturbs it) — and the term decodes
    // from id mod 8 after the aggregate. An event type outside the
    // dictionary raises instead of silently corrupting the packing.
    val codeRaw = F.array_position(F.typedlit(EventTypes), F.col("event_type"))
    val code = F.when(codeRaw === 0, F.raise_error(F.concat(
        F.lit("q_group_concat: event_type outside the dictionary: "),
        F.col("event_type"))))
      .otherwise(codeRaw - 1)
    val ev = Tables(s, dir, "events")
      .select(F.col("user_id"),
        (-F.unix_micros(F.col("ts"))).cast("double").as("negtu"),
        (F.col("event_id") * 8 + code).as("packed"))
    graft.operators.TopK.perGroup(ev, Seq("user_id"),
        F.col("negtu"), F.col("packed"), k = 8)
      .select(F.col("user_id"), F.col("rnk"),
        F.element_at(F.typedlit(EventTypes),
          (F.pmod(F.col("id"), F.lit(8L)) + 1).cast("int")).as("term"))
      .groupBy("user_id")
      .agg(F.concat_ws(",", F.expr(
        "transform(sort_array(collect_list(struct(rnk, term))), x -> x.term)"))
        .as("first_types"))
  }

  val qGroupConcatSql: String =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS rnk
      |  FROM events)
      |SELECT user_id, string_agg(event_type, ',' ORDER BY rnk) AS first_types
      |FROM r WHERE rnk <= 8 GROUP BY 1""".stripMargin

  /** q_lead_lag: ClickHouse `neighbor(...)` shape — per user, in time
    * order: gap to the previous event (µs) and the next event's id. One
    * window sort per user partition; integer arithmetic end to end. */
  def qLeadLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(F.col("tu").asc, F.col("event_id").asc)
    Tables(s, dir, "events")
      .select(F.col("user_id"), F.col("event_id"), F.unix_micros(F.col("ts")).as("tu"))
      .select(F.col("user_id"), F.col("event_id"),
        (F.col("tu") - F.lag("tu", 1).over(w)).as("gap_us"),
        F.lead("event_id", 1).over(w).as("next_event_id"))
  }

  val qLeadLagSql: String =
    """SELECT user_id, event_id,
      | epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_us,
      | LEAD(event_id, 1) OVER w AS next_event_id
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)""".stripMargin

  /** q_histogram: fixed-width value histogram of order totals (the
    * ClickHouse `histogram`/`width_bucket` shape). The bucket id is a
    * single double division + floor — identical IEEE ops on both engines
    * — and the aggregate is one partial-aggregatable groupBy. */
  def qHistogram(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .select(F.floor(F.col("o_totalprice") / 50000.0).cast("long").as("bucket"),
        dec2(F.col("o_totalprice")).as("p"))
      .groupBy("bucket")
      .agg(F.count(F.lit(1)).as("n"), out2(F.sum("p")).as("sum_price"))

  val qHistogramSql: String =
    """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
      | COUNT(*) AS n,
      | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1""".stripMargin

  /** q_limit_by: ClickHouse `LIMIT 2 BY o_custkey` — each customer's
    * first 2 orders by (date, key). Unlike q_window_topn's handful of
    * groups, the grouping key is high-cardinality: the window partitions
    * by customer, so the sort is many small per-key sorts that scale out
    * with the key space. */
  def qLimitBy(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(F.col("o_orderdate").asc, F.col("o_orderkey").asc)
    Tables(s, dir, "orders")
      .select(F.col("o_custkey"), F.col("o_orderkey"), F.col("o_orderdate"))
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= 2)
      .select(F.col("o_custkey"), F.col("o_orderkey"), F.col("rn"))
  }

  val qLimitBySql: String =
    """SELECT o_custkey, o_orderkey, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |   ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 2""".stripMargin

  /** q_uniq_arr: ClickHouse `groupUniqArray` — the sorted distinct set of
    * active days per event type, emitted as CSV (array stringification
    * differs between pandas and DuckDB df(), strings don't). collect_set
    * state is bounded by the value domain (days), not row count. */
  def qUniqArr(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(F.col("event_type"), F.dayofmonth(F.col("ts")).as("d"))
      .groupBy("event_type")
      .agg(F.concat_ws(",",
        F.transform(F.sort_array(F.collect_set("d")), _.cast("string"))).as("days"))

  val qUniqArrSql: String =
    """SELECT event_type,
      | array_to_string(list_sort(list(DISTINCT CAST(extract(day FROM ts) AS INTEGER))), ',') AS days
      |FROM events GROUP BY 1""".stripMargin

  /** q_topk_freq: ClickHouse `topK()` — top-5 terms per source computed
    * through the Misra-Gries sketch aggregate (graft.operators.FreqItems):
    * 64 bounded counters per group, map-side partials, O(groups×capacity)
    * shuffle — vs the exact form's one row per DISTINCT (source, term).
    * This corpus's per-source vocabulary (31) fits the capacity, so the
    * sketch is in its exact regime and shares the exact ranking's oracle;
    * FreqItemsSpec covers the approximate regime's error bounds. */
  def qTopkFreq(s: SparkSession, dir: String): DataFrame = {
    val terms = Tables(s, dir, "documents")
      .select(F.col("source"), F.explode(F.split(F.col("text"), " ")).as("term"))
    graft.operators.FreqItems.perGroup(terms, Seq("source"), F.col("term"),
      capacity = 64, k = 5)
  }

  val qTopkFreqSql: String =
    """WITH counts AS (
      |  SELECT source, term, COUNT(*) AS n
      |  FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
      |  GROUP BY 1, 2)
      |SELECT source, rnk, term, CAST(n AS BIGINT) AS cnt FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, term ASC) AS rnk
      |  FROM counts)
      |WHERE rnk <= 5""".stripMargin

  /** q_topk_weighted: ClickHouse `topKWeighted()` — top-3 users per event
    * type ranked by accumulated spend (cents), through the WEIGHTED
    * Misra-Gries aggregate: each arrival counts its weight, state stays
    * `capacity` counters per group. 4096 ≥ the user cardinality at every
    * gate scale (150 at sf0.01, 1500 at sf0.1), so the sketch runs exact
    * there and shares the exact grouped-sum ranking's oracle — while the
    * state stays a fixed 4096 counters per group however large the stream
    * grows; FreqItemsSpec covers the weighted approximate regime (m=8,
    * where evictions DO fire). Ranking tie-break is (weight DESC,
    * term-string ASC) on both sides. */
  def qTopkWeighted(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(F.col("event_type"), F.col("user_id"),
        (dec2(F.col("value")) * 100).cast("long").as("wc"))
    graft.operators.FreqItems.perGroupWeighted(ev, Seq("event_type"),
      F.col("user_id"), F.col("wc"), capacity = 4096, k = 3)
  }

  val qTopkWeightedSql: String =
    """WITH uv AS (
      |  SELECT event_type, CAST(user_id AS VARCHAR) AS term,
      |   CAST(SUM(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, rnk, term, cnt FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cnt DESC, term ASC) AS rnk
      |  FROM uv)
      |WHERE rnk <= 3""".stripMargin

  /** q_summap: ClickHouse `sumMap` — per event type, the per-day value
    * sums as an ordered day:sum map (emitted as CSV — map/array
    * stringification differs between pandas and DuckDB, strings don't).
    * Two partial-aggregatable groupBys (the first shrinks rows to
    * |types|×|days|); sums in exact decimal so the rendered strings match
    * the oracle digit for digit. */
  def qSumMap(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(F.col("event_type"), F.dayofmonth(F.col("ts")).as("d"),
        dec2(F.col("value")).as("v"))
      .groupBy("event_type", "d")
      .agg(F.sum("v").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("sv"))
      .groupBy("event_type")
      .agg(F.concat_ws(",", F.transform(
        F.sort_array(F.collect_list(F.struct(F.col("d"), F.col("sv")))),
        p => F.concat(p("d").cast("string"), F.lit(":"), p("sv").cast("string"))))
        .as("day_sums"))

  val qSumMapSql: String =
    """WITH m AS (
      |  SELECT event_type, CAST(extract(day FROM ts) AS INTEGER) AS d,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sv
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type,
      |  array_to_string(list(CAST(d AS VARCHAR) || ':' || CAST(sv AS VARCHAR) ORDER BY d), ',') AS day_sums
      |FROM m GROUP BY 1""".stripMargin

  /** q_minmax_map: ClickHouse `minMap`/`maxMap` — per event type, the
    * per-day value extremes as an ordered day:min:max map (CSV-rendered
    * like q_summap). Min/max in exact cents — no float discipline needed
    * at all; both groupBys partial-aggregate. */
  def qMinMaxMap(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(F.col("event_type"), F.dayofmonth(F.col("ts")).as("d"),
        (dec2(F.col("value")) * 100).cast("long").as("vc"))
      .groupBy("event_type", "d")
      .agg(F.min("vc").as("mn"), F.max("vc").as("mx"))
      .groupBy("event_type")
      .agg(F.concat_ws(",", F.transform(
        F.sort_array(F.collect_list(F.struct(F.col("d"), F.col("mn"), F.col("mx")))),
        p => F.concat(p("d").cast("string"), F.lit(":"), p("mn").cast("string"),
          F.lit(":"), p("mx").cast("string"))))
        .as("day_extremes"))

  val qMinMaxMapSql: String =
    """WITH m AS (
      |  SELECT event_type, CAST(extract(day FROM ts) AS INTEGER) AS d,
      |   MIN(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS mn,
      |   MAX(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS mx
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type,
      |  array_to_string(list(CAST(d AS VARCHAR) || ':' || CAST(mn AS VARCHAR) || ':' || CAST(mx AS VARCHAR) ORDER BY d), ',') AS day_extremes
      |FROM m GROUP BY 1""".stripMargin

  /** q_exp_decay: ClickHouse arrayFold/exponentialMovingAverage shape —
    * per user, fold the time-ordered value sequence through
    * s ← s·0.5 + v. The fold is the same ordered left fold on both
    * engines (Spark `aggregate` ≡ DuckDB `list_reduce` with a prepended
    * 0.0 init, identical IEEE ops in identical order → bit-identical
    * doubles); emitted floor-scaled to 1e-6 as a belt-and-suspenders
    * integer. One shuffle on user_id; per-user state is the collected
    * sequence (same bound as q_funnel). */
  def qExpDecay(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(F.col("user_id"),
        F.struct(F.unix_micros(F.col("ts")).as("tu"),
          F.col("event_id"), F.col("value").as("v")).as("e"))
      .groupBy("user_id")
      .agg(F.sort_array(F.collect_list("e")).as("seq"))
      .select(F.col("user_id"),
        F.size(F.col("seq")).cast("long").as("n"),
        F.floor(F.aggregate(F.col("seq"), F.lit(0.0),
          (acc, e) => acc * 0.5 + e("v")) * 1e6).cast("long").as("decay6"))

  val qExpDecaySql: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
      | CAST(floor(list_reduce(
      |   list_prepend(CAST(0.0 AS DOUBLE), list(value ORDER BY epoch_us(ts) ASC, event_id ASC)),
      |   (acc, x) -> acc * 0.5 + x) * 1e6) AS BIGINT) AS decay6
      |FROM events GROUP BY 1""".stripMargin

  /** q_seq_count: ClickHouse `sequenceCount('(?1)(?2)')` — per user, the
    * number of NON-OVERLAPPING click→purchase occurrences in time order
    * (each completed match restarts the search; contrast q_seqmatch's
    * existence test and q_funnel's depth).
    *
    * The two-state matcher folds over the ordered event codes with its
    * whole state packed into ONE non-negative long — low bit = "armed by
    * a click", upper bits = completed count — so the transition is two
    * integer ops (click: acc|1, purchase on armed acc: acc+1) and the
    * identical fold runs on both engines (Spark `aggregate` ≡ DuckDB
    * `list_reduce` with prepended 0 init) with exact integer results at
    * any scale. */
  def qSeqCount(s: SparkSession, dir: String): DataFrame = {
    val code = F.when(F.col("event_type") === "click", 1L)
      .when(F.col("event_type") === "purchase", 2L).otherwise(0L)
    val step: (Column, Column) => Column = (acc, x) =>
      F.when(x === 1L, acc.bitwiseOR(1L))
        .when(x === 2L && acc % 2 === 1L, acc + 1L)
        .otherwise(acc)
    Tables(s, dir, "events")
      .select(F.col("user_id"),
        F.struct(F.unix_micros(F.col("ts")).as("tu"),
          F.col("event_id"), code.as("x")).as("e"))
      .groupBy("user_id")
      .agg(F.sort_array(F.collect_list("e")).as("seq"))
      .select(F.col("user_id"),
        F.size(F.col("seq")).cast("long").as("n"),
        F.shiftright(F.aggregate(
          F.transform(F.col("seq"), e => e("x")), F.lit(0L), step), 1).as("seq_cnt"))
  }

  /** Oracle via the closed form, not list_reduce (DuckDB 1.0.0's
    * list_reduce returns wrong folds on some grouped ~100-element lists
    * — verified against a hand fold of the identical list): the greedy
    * non-overlapping (?1)(?2) count equals, in the click/purchase
    * subsequence, the number of purchases whose immediate predecessor is
    * a click (extra clicks collapse into the armed state; a counted
    * purchase disarms). */
  val qSeqCountSql: String =
    """WITH cp AS (
      |  SELECT user_id, event_type,
      |   LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |m AS (
      |  SELECT user_id,
      |   CAST(COUNT(*) FILTER (WHERE event_type = 'purchase' AND prev = 'click') AS BIGINT) AS seq_cnt
      |  FROM cp GROUP BY 1),
      |n AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1)
      |SELECT n.user_id, n.n, CAST(COALESCE(m.seq_cnt, 0) AS BIGINT) AS seq_cnt
      |FROM n LEFT JOIN m ON m.user_id = n.user_id""".stripMargin

  /** q_histogram_eqd: EQUI-DEPTH histogram per event type (the
    * complement of q_histogram's equi-width buckets — bucket BOUNDS are
    * the signal, counts are equal by construction ±1): ntile(8) over the
    * total order (value cents, event_id) makes bucket assignment
    * deterministic; per bucket emit count and exact cents bounds. One
    * window + one rollup per series. */
  def qHistogramEqd(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("vc", "event_id")
    Tables(s, dir, "events")
      .select(F.col("event_type"), F.col("event_id"),
        (Tables.dec2(F.col("value")) * 100).cast("long").as("vc"))
      .withColumn("b", F.ntile(8).over(w).cast("long"))
      .groupBy("event_type", "b")
      .agg(F.count(F.lit(1)).as("n"),
        F.min("vc").as("lo_c"), F.max("vc").as("hi_c"))
  }

  /** SCALE TIER for q_histogram_eqd (SURVEY §5): equi-depth bucket CUTS
    * from approx_percentile — per-type rank error ≤ n/accuracy — instead
    * of ntile's per-type GLOBAL sort (one task sorts one type's whole
    * history, the r6 VERDICT's #2 weak plan). The cuts aggregate is
    * map-side-combined (GK sketch per partition), the assignment a
    * broadcast compare, and the only shuffle the final (type, bucket)
    * rollup; counts/bounds per bucket stay EXACT — only the cut
    * placement is approximate, off by at most the sketch's rank error.
    * The ntile form above remains the exactness/oracle tier;
    * HistogramEqdCutsSpec proves each cut lands within rank tolerance
    * of its exact target. */
  def qHistogramEqdCuts(s: SparkSession, dir: String, buckets: Int = 8,
                        accuracy: Int = 10000): DataFrame = {
    val v = Tables(s, dir, "events")
      .select(F.col("event_type"),
        (Tables.dec2(F.col("value")) * 100).cast("long").as("vc"))
    val fracs = (1 until buckets).map(i => i.toDouble / buckets)
    val cuts = v.groupBy("event_type")
      .agg(F.percentile_approx(F.col("vc"), F.typedlit(fracs),
        F.lit(accuracy)).as("cuts"))
    v.join(F.broadcast(cuts), "event_type")
      .withColumn("b", F.expr("1 + cast(size(filter(cuts, c -> c < vc)) as long)"))
      .groupBy("event_type", "b")
      .agg(F.count(F.lit(1)).as("n"),
        F.min("vc").as("lo_c"), F.max("vc").as("hi_c"))
  }

  /** DRIVER GATE for the [[qHistogramEqdCuts]] scale tier (the plan a
    * 100 TB deployment actually runs): per (event_type, cut), emit
    * ok = 1 iff the GK sketch cut's feasible rank interval
    * [count(<cut)+1, count(≤cut)] intersects the exact target rank
    * i·n/buckets within the sketch tolerance n/accuracy (+2 rounding
    * slack) — the literal guarantee percentile_approx ships. The oracle
    * is the all-ones frame over types × cuts, so ANY out-of-tolerance
    * cut hash-breaks the gate; the check is exact BIGINT throughout
    * (ranks scaled by `buckets` instead of dividing n). Plan shape: the
    * same map-side-combined cuts aggregate as the tier itself, one
    * broadcast of the |types|-row cuts frame, per-cut rank counts as
    * columnar conditional sums in ONE (event_type) aggregate — no row
    * multiplication, no window, no global sort. */
  def qHistogramEqdCutsCheck(s: SparkSession, dir: String, buckets: Int = 8,
                             accuracy: Int = 10000): DataFrame = {
    val b = buckets.toLong
    val v = Tables(s, dir, "events")
      .select(F.col("event_type"),
        (Tables.dec2(F.col("value")) * 100).cast("long").as("vc"))
    val fracs = (1 until buckets).map(i => i.toDouble / buckets)
    val cuts = v.groupBy("event_type")
      .agg(F.percentile_approx(F.col("vc"), F.typedlit(fracs),
        F.lit(accuracy)).as("cuts"))
    val vj = v.join(F.broadcast(cuts), "event_type")
    val aggs = (0 until buckets - 1).flatMap { i =>
      Seq(F.sum(F.when(F.col("vc") < F.expr(s"cuts[$i]"), 1L).otherwise(0L))
          .as(s"lt$i"),
        F.sum(F.when(F.col("vc") <= F.expr(s"cuts[$i]"), 1L).otherwise(0L))
          .as(s"le$i"))
    } :+ F.count(F.lit(1)).as("n")
    val g = vj.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    val tol = F.expr(s"n div $accuracy") + F.lit(2L)
    (1 until buckets).map { i =>
      g.select(F.col("event_type"), F.lit(i.toLong).as("cut_idx"),
        F.when(
          F.lit(b) * F.col(s"le${i - 1}") >=
            F.lit(i.toLong) * F.col("n") - F.lit(b) * tol &&
          F.lit(b) * (F.col(s"lt${i - 1}") + F.lit(1L)) <=
            F.lit(i.toLong) * F.col("n") + F.lit(b) * tol,
          1L).otherwise(0L).as("ok"))
    }.reduce(_ unionByName _)
  }

  val qHistogramEqdCutsCheckSql: String =
    """SELECT t.event_type, i.i AS cut_idx, CAST(1 AS BIGINT) AS ok
      |FROM (SELECT DISTINCT event_type FROM events) t
      |CROSS JOIN (SELECT CAST(UNNEST(generate_series(1, 7)) AS BIGINT) AS i) i""".stripMargin

  val qHistogramEqdSql: String =
    """WITH v AS (
      |  SELECT event_type, event_id,
      |   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      |  FROM events),
      |t AS (
      |  SELECT event_type, vc,
      |   CAST(NTILE(8) OVER (PARTITION BY event_type ORDER BY vc, event_id) AS BIGINT) AS b
      |  FROM v)
      |SELECT event_type, b, COUNT(*) AS n,
      | CAST(MIN(vc) AS BIGINT) AS lo_c, CAST(MAX(vc) AS BIGINT) AS hi_c
      |FROM t GROUP BY 1, 2""".stripMargin

  /** q_hist_pow2: power-of-two (log₂-scaled) value histogram per event
    * type — the classic latency/size-histogram shape every monitoring
    * stack ships (ClickHouse dashboards typically emulate it with
    * exp2 buckets): bucket = the cents value's binary digit count,
    * computed as length(bin(vc)) — bin() renders positive BIGINTs
    * without leading zeros identically in Spark and DuckDB, so the
    * bucketing is engine-exact with zero arithmetic. Pure map +
    * (type, bucket) aggregate: nothing here changes shape at any
    * scale. */
  def qHistPow2(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(F.col("event_type"),
        (Tables.dec2(F.col("value")) * 100).cast("long").as("vc"))
      .filter(F.col("vc") > 0)
      .withColumn("b", F.length(F.expr("bin(vc)")).cast("long"))
      .groupBy("event_type", "b")
      .agg(F.count(F.lit(1)).as("n"),
        F.min("vc").as("lo_c"), F.max("vc").as("hi_c"))

  val qHistPow2Sql: String =
    """WITH v AS (
      |  SELECT event_type,
      |   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      |  FROM events)
      |SELECT event_type, CAST(length(bin(vc)) AS BIGINT) AS b, COUNT(*) AS n,
      | CAST(MIN(vc) AS BIGINT) AS lo_c, CAST(MAX(vc) AS BIGINT) AS hi_c
      |FROM v WHERE vc > 0 GROUP BY 1, 2""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_hist_pow2", qHistPow2 _, Some(qHistPow2Sql)),
    ("q_histogram_eqd", qHistogramEqd _, Some(qHistogramEqdSql)),
    ("q_histogram_eqd_cuts", ((s: SparkSession, dir: String) =>
      qHistogramEqdCutsCheck(s, dir)): Q, Some(qHistogramEqdCutsCheckSql)),
    ("q_seq_count", qSeqCount _, Some(qSeqCountSql)),
    ("q_exp_decay", qExpDecay _, Some(qExpDecaySql)),
    ("q_summap", qSumMap _, Some(qSumMapSql)),
    ("q_topk_freq", qTopkFreq _, Some(qTopkFreqSql)),
    ("q_topk_weighted", qTopkWeighted _, Some(qTopkWeightedSql)),
    ("q_minmax_map", qMinMaxMap _, Some(qMinMaxMapSql)),
    ("q_condagg", qCondAgg _, Some(qCondAggSql)),
    ("q_pivot", qPivot _, Some(qPivotSql)),
    ("q_group_concat", qGroupConcat _, Some(qGroupConcatSql)),
    ("q_lead_lag", qLeadLag _, Some(qLeadLagSql)),
    ("q_histogram", qHistogram _, Some(qHistogramSql)),
    ("q_limit_by", qLimitBy _, Some(qLimitBySql)),
    ("q_uniq_arr", qUniqArr _, Some(qUniqArrSql)))
}
