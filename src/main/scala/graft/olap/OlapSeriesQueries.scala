package graft.olap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

import graft.Tables

/** Ordered time-series aggregates (ClickHouse `deltaSum` and
  * `intervalLengthSum`) — both are "fold the group's time-sorted rows"
  * shapes, spelled as ONE window sort per group plus a hash aggregate, so
  * the shuffle is keyed on the (high-cardinality) group key and per-group
  * state never leaves the executor. All arithmetic is BIGINT (cents /
  * epoch seconds): cross-engine exact by construction.
  */
object OlapSeriesQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q_delta_sum: ClickHouse `deltaSum(value)` per user — the sum of
    * POSITIVE increments of the time-ordered value sequence (counter-reset
    * handling for monotone-ish gauges). The order is a TOTAL order
    * ((ts, event_id) tiebreak): a tie-ambiguous sort would make lag()
    * nondeterministic across engines. Values in exact cents; the first
    * row of each group contributes 0 (lag is null). */
  def qDeltaSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(F.col("tu").asc, F.col("event_id").asc)
    Tables(s, dir, "events")
      .select(F.col("user_id"), F.col("event_id"),
        F.unix_micros(F.col("ts")).as("tu"),
        (Tables.dec2(F.col("value")) * 100).cast("long").as("vc"))
      .withColumn("d", F.col("vc") - F.lag("vc", 1).over(w))
      .groupBy("user_id")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.greatest(F.col("d"), F.lit(0L))).as("delta_sum_c"))
  }

  val qDeltaSumSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tu,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc
      |  FROM events),
      |d AS (
      |  SELECT user_id,
      |   vc - LAG(vc, 1) OVER (PARTITION BY user_id ORDER BY tu ASC, event_id ASC) AS d
      |  FROM ev)
      |SELECT user_id, COUNT(*) AS n,
      | CAST(SUM(GREATEST(d, 0)) AS BIGINT) AS delta_sum_c
      |FROM d GROUP BY 1""".stripMargin

  /** q_interval_sum: ClickHouse `intervalLengthSum` per user — the length
    * of the UNION of the user's activity intervals (overlaps counted
    * once). Interval i = [start, start + 60 + event_id mod 600) in epoch
    * seconds (deterministic data-derived lengths so overlaps actually
    * vary). The classic one-sort sweep: rows sorted by start; each row
    * contributes max(0, end − max(start, maxEndOfAllPriorRows)) — the
    * running max over the PRECEDING frame needs no tiebreak sensitivity
    * for the SUM (equal starts commute), but the sort is still total for
    * engine parity. Per-group work is a single window pass: at 100 TB
    * this is one shuffle on user_id, no self-join over interval pairs. */
  def qIntervalSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(F.col("st").asc, F.col("en").asc, F.col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(s, dir, "events")
      .select(F.col("user_id"), F.col("event_id"),
        F.expr("unix_micros(ts) div 1000000").as("st"))
      .withColumn("en", F.col("st") + 60L + F.col("event_id") % 600L)
      .withColumn("pm", F.max("en").over(w))
      .groupBy("user_id")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.greatest(
          F.col("en") - F.greatest(F.col("st"), F.coalesce(F.col("pm"), F.col("st"))),
          F.lit(0L))).as("covered_sec"))
  }

  val qIntervalSumSql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS st,
      |   epoch_us(ts) // 1000000 + 60 + event_id % 600 AS en
      |  FROM events),
      |sw AS (
      |  SELECT user_id, st, en,
      |   MAX(en) OVER (PARTITION BY user_id ORDER BY st ASC, en ASC, event_id ASC
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |  FROM iv)
      |SELECT user_id, COUNT(*) AS n,
      | CAST(SUM(GREATEST(en - GREATEST(st, COALESCE(pm, st)), 0)) AS BIGINT) AS covered_sec
      |FROM sw GROUP BY 1""".stripMargin

  /** q_seq_next_node: ClickHouse `sequenceNextNode` — for each user, the
    * event type that immediately follows their FIRST click in the total
    * (ts, event_id) order. Two grouped min-struct passes (first click,
    * then earliest strictly-later event) — witnesses are deterministic by
    * the total order, no window over the full event stream. Users with no
    * click or nothing after it yield NULLs (LEFT join keeps them). */
  def qSeqNextNode(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(F.col("user_id"), F.unix_micros(F.col("ts")).as("tu"),
        F.col("event_id"), F.col("event_type").as("et"))
    val firstClick = ev.filter(F.col("et") === "click")
      .groupBy("user_id")
      .agg(F.min(F.struct(F.col("tu"), F.col("event_id").as("k"))).as("c"))
    val next = ev.join(firstClick, "user_id")
      .filter(F.col("tu") > F.col("c.tu") ||
        (F.col("tu") === F.col("c.tu") && F.col("event_id") > F.col("c.k")))
      .groupBy("user_id")
      .agg(F.min(F.struct(F.col("tu"), F.col("event_id").as("k"), F.col("et"))).as("nx"))
    ev.select("user_id").distinct()
      .join(next, Seq("user_id"), "left_outer")
      .select(F.col("user_id"), F.col("nx.et").as("next_et"), F.col("nx.k").as("next_eid"))
  }

  val qSeqNextNodeSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS tu, event_id, event_type AS et FROM events),
      |fc AS (
      |  SELECT user_id, tu AS ctu, event_id AS cid FROM (
      |    SELECT user_id, tu, event_id,
      |     ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tu ASC, event_id ASC) AS rn
      |    FROM ev WHERE et = 'click') WHERE rn = 1),
      |nx AS (
      |  SELECT user_id, et, event_id FROM (
      |    SELECT e.user_id, e.et, e.event_id,
      |     ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.tu ASC, e.event_id ASC) AS rn
      |    FROM ev e JOIN fc ON e.user_id = fc.user_id
      |     AND (e.tu > fc.ctu OR (e.tu = fc.ctu AND e.event_id > fc.cid))) WHERE rn = 1)
      |SELECT u.user_id, nx.et AS next_et, nx.event_id AS next_eid
      |FROM (SELECT DISTINCT user_id FROM ev) u
      |LEFT JOIN nx ON nx.user_id = u.user_id""".stripMargin

  /** q_arr_suite: the ClickHouse array-combinator surface (arrayFilter /
    * arraySum / arrayZip+arrayMap / arrayDistinct+arraySort+arraySlice)
    * exercised end-to-end on per-user time-ordered value arrays, all in
    * Spark's codegen'd higher-order functions — `filter`, `aggregate`,
    * `zip_with`+`sequence`, `array_distinct`/`array_sort`/`slice`. The
    * array is assembled once per user (sort_array over collected structs
    * = deterministic time order), every derived stat is exact BIGINT, and
    * the oracle recomputes the same numbers via plain window SQL — the
    * list is a Spark-side representation choice, not a semantic one. */
  def qArrSuite(s: SparkSession, dir: String): DataFrame = {
    val arr = F.transform(
      F.sort_array(F.collect_list(F.struct(F.col("tu"), F.col("event_id").as("k"),
        F.col("vc")))), x => x.getField("vc"))
    Tables(s, dir, "events")
      .select(F.col("user_id"), F.unix_micros(F.col("ts")).as("tu"),
        F.col("event_id"), (Tables.dec2(F.col("value")) * 100).cast("long").as("vc"))
      .groupBy("user_id")
      .agg(arr.as("a"))
      .select(F.col("user_id"),
        F.size(F.col("a")).cast("long").as("n"),
        F.aggregate(F.filter(F.col("a"), _ > 5000L), F.lit(0L), _ + _).as("sum_hi"),
        F.aggregate(
          F.zip_with(F.col("a"), F.sequence(F.lit(1L), F.size(F.col("a")).cast("long")),
            (v, i) => v * i),
          F.lit(0L), _ + _).as("zsum"),
        F.concat_ws(",", F.transform(
          F.slice(F.reverse(F.array_sort(F.array_distinct(F.col("a")))), 1, 3),
          _.cast("string"))).as("top3_csv"))
  }

  val qArrSuiteSql: String =
    """WITH ev AS (
      |  SELECT user_id,
      |   CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS vc,
      |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS i
      |  FROM events),
      |base AS (
      |  SELECT user_id, COUNT(*) AS n,
      |   CAST(SUM(CASE WHEN vc > 5000 THEN vc ELSE 0 END) AS BIGINT) AS sum_hi,
      |   CAST(SUM(vc * i) AS BIGINT) AS zsum
      |  FROM ev GROUP BY 1),
      |tops AS (
      |  SELECT user_id, string_agg(CAST(vc AS VARCHAR), ',' ORDER BY vc DESC) AS top3_csv
      |  FROM (
      |    SELECT user_id, vc,
      |     ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY vc DESC) AS r
      |    FROM (SELECT DISTINCT user_id, vc FROM ev))
      |  WHERE r <= 3 GROUP BY 1)
      |SELECT b.user_id, b.n, b.sum_hi, b.zsum, t.top3_csv
      |FROM base b JOIN tops t ON b.user_id = t.user_id""".stripMargin

  /** q_range_frame: RANGE-frame window aggregate (the ClickHouse / ANSI
    * `RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW` shape) —
    * per event, the exact-decimal sum and count of the same user's events
    * in the trailing hour. RANGE (unlike ROWS) includes ALL peers at the
    * current timestamp, so the frame is deterministic even under ts ties
    * with no tiebreak column. One window sort per user partition; sums
    * accumulate in DECIMAL and emit as DOUBLE. */
  def qRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(F.col("tu"))
      .rangeBetween(-3600000000L, 0L) // µs
    Tables(s, dir, "events")
      .select(F.col("user_id"), F.col("event_id"),
        F.unix_micros(F.col("ts")).as("tu"),
        Tables.dec2(F.col("value")).as("v"))
      .select(F.col("user_id"), F.col("event_id"),
        Tables.out2(F.sum("v").over(w)).as("sum1h"),
        F.count(F.lit(1)).over(w).as("n1h"))
  }

  val qRangeFrameSql: String =
    """SELECT user_id, event_id,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS sum1h,
      | COUNT(*) OVER w AS n1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_range_frame", qRangeFrame _, Some(qRangeFrameSql)),
    ("q_delta_sum", qDeltaSum _, Some(qDeltaSumSql)),
    ("q_interval_sum", qIntervalSum _, Some(qIntervalSumSql)),
    ("q_seq_next_node", qSeqNextNode _, Some(qSeqNextNodeSql)),
    ("q_arr_suite", qArrSuite _, Some(qArrSuiteSql)))
}
