package graft.olap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.Tables
import graft.Tables.{dec2, out2}

/** Additional OLAP shapes beyond the core set: correlated-min subquery
  * (TPC-H Q2 shape) and semi/anti-join existence queries (EXISTS / NOT
  * EXISTS) — both common ClickHouse-style analytics the reference's
  * deployments run. */
object OlapExtraQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q_minsub: for each large part, the supplier(s) achieving the minimum
    * extended price — correlated aggregate decorrelated into a join with
    * a grouped min (exactly what Catalyst does to the EXISTS form).
    * Broadcast: part (dimension-sized after the p_size filter). */
  def qMinSub(s: SparkSession, dir: String): DataFrame = {
    val part = Tables(s, dir, "part").filter(F.col("p_size") >= 40)
      .select("p_partkey", "p_name")
    val li = Tables(s, dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    val mins = li.join(F.broadcast(part), F.col("l_partkey") === F.col("p_partkey"))
      .groupBy("p_partkey", "p_name")
      .agg(F.min(dec2(F.col("l_extendedprice"))).as("min_price"))
    li.join(F.broadcast(mins),
        F.col("l_partkey") === F.col("p_partkey") &&
          dec2(F.col("l_extendedprice")) === F.col("min_price"))
      .groupBy("p_partkey", "p_name", "min_price")
      .agg(F.min("l_suppkey").as("best_suppkey"))
      .select(F.col("p_partkey"), F.col("p_name"),
        out2(F.col("min_price")).as("min_price"), F.col("best_suppkey"))
  }

  val qMinSubSql: String =
    """WITH pp AS (SELECT p_partkey, p_name FROM part WHERE p_size >= 40),
      |mins AS (
      |  SELECT p_partkey, p_name, MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS min_price
      |  FROM lineitem JOIN pp ON l_partkey = p_partkey
      |  GROUP BY 1, 2)
      |SELECT m.p_partkey, m.p_name, CAST(m.min_price AS DECIMAL(18,2)) AS min_price,
      |  MIN(l.l_suppkey) AS best_suppkey
      |FROM lineitem l JOIN mins m
      |  ON l.l_partkey = m.p_partkey AND CAST(l.l_extendedprice AS DECIMAL(18,2)) = m.min_price
      |GROUP BY 1, 2, 3""".stripMargin

  /** q_semi_anti: customers with ≥1 order in 1996 (semi) and no order
    * over 300k ever (anti), counted per market segment. Semi/anti joins
    * never widen rows — Spark keeps them build-side broadcast when the
    * filtered orders side is small. */
  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val orders = Tables(s, dir, "orders")
    val in96 = orders.filter(
      F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp") &&
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
      .select("o_custkey")
    val big = orders.filter(F.col("o_totalprice") > 300000.0).select("o_custkey")
    cust
      .join(in96, F.col("c_custkey") === in96("o_custkey"), "left_semi")
      .join(big, F.col("c_custkey") === big("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(F.count(F.lit(1)).as("n_cust"))
  }

  val qSemiAntiSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_cust
      |FROM customer c
      |WHERE EXISTS (
      |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |      AND o.o_totalprice > 300000.0)
      |GROUP BY 1""".stripMargin

  /** q_json: semi-structured extraction (ClickHouse JSONExtract shape) —
    * pull `props.k` out of the JSON string column and aggregate it.
    * get_json_object is codegen'd; the path never leaves the scan
    * projection, so this stays a single map + partial-agg pass. */
  def qJson(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(F.col("event_type"),
        F.get_json_object(F.col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(F.count(F.lit(1)).as("n"), F.sum("k").as("sum_k"),
        F.min("k").as("min_k"), F.max("k").as("max_k"))

  val qJsonSql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      | MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
      | MAX(CAST(props->>'k' AS BIGINT)) AS max_k
      |FROM events GROUP BY 1""".stripMargin

  /** q_cube: full CUBE grouping-sets over two dimensions. */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(out2(F.sum(dec2(F.col("l_quantity")))).as("sum_qty"),
        F.count(F.lit(1)).as("n"))

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty, COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  /** q_approx_pct: sketch-based percentiles (ClickHouse quantileTDigest
    * shape) — rows-only (sketch internals are engine-specific); the spec
    * bounds error vs the exact q_percentile. Mergeable sketches keep this
    * one partial-agg pass at any scale. */
  def qApproxPct(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        F.percentile_approx(F.col("l_extendedprice"), F.lit(0.5), F.lit(10000)).as("ap50"),
        F.percentile_approx(F.col("l_extendedprice"), F.lit(0.9), F.lit(10000)).as("ap90"))

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_minsub", qMinSub _, Some(qMinSubSql)),
    ("q_semi_anti", qSemiAnti _, Some(qSemiAntiSql)),
    ("q_json", qJson _, Some(qJsonSql)),
    ("q_cube", qCube _, Some(qCubeSql)),
    ("q_approx_pct", qApproxPct _, None))
}
