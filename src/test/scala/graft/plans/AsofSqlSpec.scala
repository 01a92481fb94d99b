package graft.plans

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** The ASOF JOIN SQL surface: the injected parser + resolution rule must
  * plan `l ASOF [LEFT] JOIN r ON ...` to the same AsOfJoinExec the
  * Dataset API reaches, with identical semantics (q_asof_sql shares
  * q_asof's driver oracle; these specs cover the plan shape, the
  * rewriter's token discipline, and the error paths). */
class AsofSqlSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // inner-join matches: (1,10)→rid 102 (rt=9), (1,5)→rid 101 (tie at rt=5,
  // largest rid), (2,30)→rid 103; no match: (1,4) (min rt is 5), (3,9)
  private def withTables[T](f: => T): T = {
    import spark.implicits._
    Seq((1L, 10L, "a"), (1L, 5L, "b"), (1L, 4L, "c"), (2L, 30L, "d"),
      (3L, 9L, "e"))
      .toDF("k", "t", "pay").createOrReplaceTempView("asof_l")
    Seq((1L, 5L, 100L, 1.5), (1L, 5L, 101L, 2.5), (1L, 9L, 102L, 3.5),
      (2L, 25L, 103L, 4.5))
      .toDF("rk", "rt", "rid", "price").createOrReplaceTempView("asof_r")
    f
  }

  test("ASOF JOIN plans to AsOfJoinExec and matches the Dataset helper") {
    withTables {
      val viaSql = spark.sql(
        """SELECT k, t, pay, rid, price FROM asof_l
          |ASOF JOIN asof_r ON k = rk AND t >= rt AND graft_asof_tie(rid)
          |""".stripMargin)
      assert(planOf(viaSql).contains("AsOfJoin "), planOf(viaSql))
      val viaApi = AsOfJoin.asof(
        spark.table("asof_l"), spark.table("asof_r"),
        "k", "t", "rk", "rt", "rid")
        .select("k", "t", "pay", "rid", "price")
      assert(viaSql.collect().map(_.toSeq).toSet ===
        viaApi.collect().map(_.toSeq).toSet)
      val rows = viaSql.collect()
      assert(rows.length == 3)
      // t=10 matches the latest rt ≤ 10 (rt=9 → rid 102), no tie involved
      assert(rows.find(_.getLong(1) == 10L).get.getLong(3) == 102L)
      // t=5: TWO right rows at rt=5 → the largest tie id (101) wins
      assert(rows.find(_.getLong(1) == 5L).get.getLong(3) == 101L)
    }
  }

  test("ASOF LEFT JOIN emits unmatched left rows with nulls") {
    withTables {
      import spark.implicits._
      Seq((3L, 1L, "none")).toDF("k", "t", "pay")
        .union(spark.table("asof_l")).createOrReplaceTempView("asof_l2")
      val df = spark.sql(
        """SELECT k, t, pay, rid FROM asof_l2
          |ASOF LEFT JOIN asof_r ON k = rk AND t >= rt AND graft_asof_tie(rid)
          |""".stripMargin)
      assert(planOf(df).contains("AsOfJoin "))
      val rows = df.collect()
      // every left row surfaces; the three non-joinable ones carry nulls
      assert(rows.length == 6)
      assert(rows.count(_.isNullAt(3)) == 3)
      assert(rows.filter(_.getLong(0) == 3L).forall(_.isNullAt(3)))
    }
  }

  test("ASOF LEFT OUTER JOIN spelling rewrites too (r6 silently degraded it)") {
    withTables {
      val df = spark.sql(
        """SELECT k, t, pay, rid FROM asof_l
          |ASOF LEFT OUTER JOIN asof_r
          |ON k = rk AND t >= rt AND graft_asof_tie(rid)""".stripMargin)
      assert(planOf(df).contains("AsOfJoin "), planOf(df))
      val rows = df.collect()
      assert(rows.length == 5)
      assert(rows.count(_.isNullAt(3)) == 2) // (1,4) and (3,9)
    }
  }

  test("ASOF LEFT JOIN keeps left rows with a NULL key/time, null-padded") {
    withTables {
      spark.sql(
        """CREATE OR REPLACE TEMP VIEW asof_ln AS
          |SELECT * FROM VALUES (CAST(1 AS BIGINT), CAST(10 AS BIGINT), 'a'),
          |  (CAST(NULL AS BIGINT), CAST(3 AS BIGINT), 'nullk'),
          |  (CAST(2 AS BIGINT), CAST(NULL AS BIGINT), 'nullt')
          |AS v(k, t, pay)""".stripMargin)
      val df = spark.sql(
        """SELECT k, t, pay, rid FROM asof_ln
          |ASOF LEFT JOIN asof_r ON k = rk AND t >= rt AND graft_asof_tie(rid)
          |""".stripMargin)
      val rows = df.collect()
      assert(rows.length == 3, rows.mkString("; "))
      assert(rows.count(_.isNullAt(3)) == 2)
      assert(rows.find(r => !r.isNullAt(0) && r.getLong(0) == 1L)
        .get.getLong(3) == 102L)
      // Dataset API parity: same retention through AsOfJoin.asof
      val api = AsOfJoin.asof(spark.table("asof_ln"), spark.table("asof_r"),
        "k", "t", "rk", "rt", "rid", leftOuter = true)
        .select("k", "t", "pay", "rid")
      assert(api.collect().map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
    }
  }

  test("ASOF JOIN ... USING (k, t) — the ClickHouse-leading spelling") {
    withTables {
      import spark.implicits._
      Seq((1L, 5L, 100L, 1.5), (1L, 5L, 101L, 2.5), (1L, 9L, 102L, 3.5),
        (2L, 25L, 103L, 4.5))
        .toDF("k", "t", "rid", "price").createOrReplaceTempView("asof_ru")
      val df = spark.sql("SELECT * FROM asof_l ASOF JOIN asof_ru USING (k, t)")
      assert(planOf(df).contains("AsOfJoin "), planOf(df))
      // merged-column convention: right's k and t drop from the output
      assert(df.columns.toSeq === Seq("k", "t", "pay", "rid", "price"))
      val rows = df.collect()
      assert(rows.length == 3)
      assert(rows.find(_.getLong(1) == 10L).get.getLong(3) == 102L)
      val lo = spark.sql(
        "SELECT * FROM asof_l ASOF LEFT JOIN asof_ru USING (k, t)").collect()
      assert(lo.length == 5 && lo.count(_.isNullAt(3)) == 2)
    }
  }

  test("graft_asof_tolerance bounds staleness in SQL (inner and left)") {
    withTables {
      // matches: (1,10)→rt 9 (gap 1), (1,5)→rt 5 (gap 0), (2,30)→rt 25
      // (gap 5 — STALE at tolerance 3)
      val inner = spark.sql(
        """SELECT k, t, rid FROM asof_l
          |ASOF JOIN asof_r ON k = rk AND t >= rt AND graft_asof_tie(rid)
          |  AND graft_asof_tolerance(3)""".stripMargin).collect()
      assert(inner.length == 2, inner.mkString("; "))
      assert(inner.forall(r => r.getLong(1) - 0 >= 0 && !r.isNullAt(2)))
      assert(!inner.exists(_.getLong(0) == 2L), "stale match must drop")
      val left = spark.sql(
        """SELECT k, t, rid FROM asof_l
          |ASOF LEFT JOIN asof_r ON k = rk AND t >= rt AND graft_asof_tie(rid)
          |  AND graft_asof_tolerance(3)""".stripMargin).collect()
      assert(left.length == 5)
      assert(left.count(_.isNullAt(2)) == 3, // (1,4), (3,9) and stale (2,30)
        left.mkString("; "))
      def msg(sql: String): String =
        intercept[Exception](spark.sql(sql).collect()).getMessage
      assert(msg(
        """SELECT * FROM asof_l ASOF JOIN asof_r
          |ON k = rk AND t >= rt AND graft_asof_tolerance(rk)""".stripMargin)
        .contains("integer literal"))
    }
  }

  test("the reversed time bound r.t <= l.t and reversed equality parse too") {
    withTables {
      val df = spark.sql(
        """SELECT k, t, rid FROM asof_l
          |ASOF JOIN asof_r ON rk = k AND rt <= t AND graft_asof_tie(rid)
          |""".stripMargin)
      assert(planOf(df).contains("AsOfJoin "))
      assert(df.collect().length == 3)
    }
  }

  test("rewriter leaves strings, comments, and regular joins alone") {
    // 'ASOF' in a literal and a line comment must not trigger the rewrite
    withTables {
      val df = spark.sql(
        """SELECT 'ASOF JOIN is a string' AS s, l.k -- ASOF JOIN comment
          |FROM asof_l l JOIN asof_r r ON l.k = r.rk""".stripMargin)
      assert(df.collect().forall(_.getString(0) == "ASOF JOIN is a string"))
      assert(!planOf(df).contains("AsOfJoin "))
    }
  }

  test("ASOF join composes inside a larger query (subquery + aggregate)") {
    withTables {
      val df = spark.sql(
        """SELECT k, COUNT(*) AS n, SUM(price) AS sp FROM (
          |  SELECT l.k, r.price FROM asof_l l
          |  ASOF JOIN asof_r r ON l.k = r.rk AND l.t >= r.rt AND graft_asof_tie(r.rid)
          |) GROUP BY k ORDER BY k""".stripMargin)
      val rows = df.collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        Seq((1L, 2L), (2L, 1L)))
    }
  }

  test("without graft_asof_tie the right time column is the tie") {
    withTables {
      val df = spark.sql(
        """SELECT k, t, price FROM asof_l
          |ASOF JOIN asof_r ON k = rk AND t >= rt""".stripMargin)
      assert(planOf(df).contains("AsOfJoin "))
      assert(df.collect().length == 3)
    }
  }

  test("TWO asof joins in one query both plan to the custom exec") {
    withTables {
      import spark.implicits._
      Seq((1L, 7L, 500L), (2L, 24L, 501L))
        .toDF("rk2", "rt2", "rid2").createOrReplaceTempView("asof_r2")
      val df = spark.sql(
        """SELECT k, t, rid, rid2 FROM asof_l
          |ASOF JOIN asof_r ON k = rk AND t >= rt AND graft_asof_tie(rid)
          |ASOF JOIN asof_r2 ON k = rk2 AND t >= rt2 AND graft_asof_tie(rid2)
          |""".stripMargin)
      val plan = planOf(df)
      assert("AsOfJoin ".r.findAllIn(plan).size >= 2, plan)
      val rows = df.collect()
      // inner semantics twice: (1,10)→rid 102 & rid2 500 and
      // (2,30)→103 & 501 survive; (1,5) drops at the SECOND join
      // (rt2=7 > 5), (1,4) and (3,9) drop at the first
      assert(rows.length == 2)
      assert(rows.find(_.getLong(1) == 10L).get.getLong(3) == 500L)
      assert(rows.find(_.getLong(1) == 30L).get.getLong(3) == 501L)
    }
  }

  test("unsupported shapes fail with a clear message") {
    withTables {
      def msg(sql: String): String =
        intercept[Exception](spark.sql(sql).collect()).getMessage
      assert(msg(
        """SELECT * FROM asof_l ASOF JOIN asof_r
          |ON k = rk AND t >= rt AND price > 1.0""".stripMargin)
        .contains("unsupported ON conjunct"))
      assert(msg(
        "SELECT * FROM asof_l ASOF JOIN asof_r ON t >= rt")
        .contains("missing key equality"))
      assert(msg(
        "SELECT * FROM asof_l ASOF JOIN asof_r ON k = rk")
        .contains("missing time bound"))
      // without the explicit check, Spark would read `ASOF` as a table
      // alias and plan a plain RIGHT join — silently wrong semantics
      assert(msg(
        "SELECT * FROM asof_l ASOF RIGHT JOIN asof_r ON k = rk AND t >= rt")
        .contains("not supported"))
      assert(msg(
        "SELECT * FROM asof_l ASOF FULL OUTER JOIN asof_r ON k = rk AND t >= rt")
        .contains("not supported"))
      assert(msg("SELECT * FROM asof_l ASOF JOIN asof_r USING (k)")
        .contains("at least (key, time)"))
      // no ON/USING at all, with the join scope closed by a ')': the
      // boundary token must trigger the descriptive error, not garbled
      // spliced SQL surfacing as an opaque Spark parse failure
      assert(msg(
        "SELECT * FROM (SELECT * FROM asof_l ASOF JOIN asof_r) x")
        .contains("requires an ON"))
      assert(msg("SELECT * FROM asof_l ASOF JOIN asof_r")
        .contains("requires an ON"))
      assert(msg("SELECT * FROM asof_l ASOF JOIN asof_r USING (rk, rid, rt)")
        .contains("exactly (key, time)"))
    }
  }
}
