package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  test("heap top-k matches window row_number top-k exactly") {
    val orders = graft.Tables(spark, SF, "orders")
    val viaHeap = TopK.perGroup(orders, Seq("o_orderpriority"),
        F.col("o_totalprice"), F.col("o_orderkey"), k = 5)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").asc)
    val viaWindow = orders
      .withColumn("rnk", F.row_number().over(w))
      .filter(F.col("rnk") <= 5)
      .select(F.col("o_orderpriority"), F.col("rnk"),
        F.col("o_totalprice"), F.col("o_orderkey"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(viaHeap == viaWindow)
  }

  test("distinct mode equals dropDuplicates-then-heap on a duplicated stream") {
    val orders = graft.Tables(spark, SF, "orders")
      .select("o_orderpriority", "o_totalprice", "o_orderkey")
    // triple every row (the LSH candidate shape: identical (score, id)
    // tuples repeated once per shared bucket), at mixed partitionings
    val tripled = orders.unionByName(orders).unionByName(orders.repartition(7))
    val viaDistinctHeap = TopK.perGroup(tripled, Seq("o_orderpriority"),
        F.col("o_totalprice"), F.col("o_orderkey"), k = 5, distinct = true)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val viaDedupFirst = TopK.perGroup(
        tripled.dropDuplicates("o_orderpriority", "o_totalprice", "o_orderkey"),
        Seq("o_orderpriority"),
        F.col("o_totalprice"), F.col("o_orderkey"), k = 5)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(viaDistinctHeap == viaDedupFirst)
    // and WITHOUT distinct the duplicates occupy heap slots (sanity
    // that the flag changes behavior on this stream)
    val plain = TopK.perGroup(tripled, Seq("o_orderpriority"),
        F.col("o_totalprice"), F.col("o_orderkey"), k = 5)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(plain != viaDistinctHeap)
  }

  test("topk_pairs works from SQL via GraftExtensions registration") {
    graft.GraftExtensions.register(spark)
    graft.Tables(spark, SF, "orders").createOrReplaceTempView("topk_orders")
    val viaSql = spark.sql(
      """SELECT o_orderpriority, e.score, e.id
        |FROM (SELECT o_orderpriority,
        |        topk_pairs(o_totalprice, o_orderkey, 3) AS tk
        |      FROM topk_orders GROUP BY 1)
        |LATERAL VIEW explode(tk) AS e""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val viaApi = TopK.perGroup(graft.Tables(spark, SF, "orders"),
        Seq("o_orderpriority"), F.col("o_totalprice"), F.col("o_orderkey"), k = 3)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getLong(3))).toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("result is stable under repartitioning (heaps merge associatively)") {
    val orders = graft.Tables(spark, SF, "orders")
    val a = TopK.perGroup(orders.repartition(1), Seq("o_orderpriority"),
      F.col("o_totalprice"), F.col("o_orderkey"), k = 3).collect().toSet
    val b = TopK.perGroup(orders.repartition(13), Seq("o_orderpriority"),
      F.col("o_totalprice"), F.col("o_orderkey"), k = 3).collect().toSet
    assert(a == b)
  }

  test("partial aggregation keeps shuffle input bounded (plan has partial_topk)") {
    val orders = graft.Tables(spark, SF, "orders")
    val plan = TopK.perGroup(orders, Seq("o_orderpriority"),
      F.col("o_totalprice"), F.col("o_orderkey"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_pairs"), plan)
  }
}
