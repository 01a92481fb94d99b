package graft.operators

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Misra-Gries frequent-items aggregate: exact regime equals the full
  * count ranking; approximate regime honors the MG error bounds; results
  * are partition-invariant (the mergeable-summary property). */
class FreqItemsSpec extends SparkSpec {

  private lazy val terms = graft.Tables(spark, SF, "documents")
    .select(F.col("source"), F.explode(F.split(F.col("text"), " ")).as("term"))

  private lazy val trueCounts: Map[(String, String), Long] =
    terms.groupBy("source", "term").agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("capacity >= vocabulary: sketch equals the exact count ranking") {
    val exact = terms.groupBy("source", "term").agg(F.count(F.lit(1)).as("n"))
      .withColumn("rnk", F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(F.col("n").desc, F.col("term").asc)))
      .filter(F.col("rnk") <= 5)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getString(1), r.getLong(2))).toSet
    val sketch = FreqItems.perGroup(terms, Seq("source"), F.col("term"), 64, 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(sketch == exact)
  }

  test("capacity < vocabulary: estimates underestimate by at most n/(m+1)") {
    val m = 8
    val totals = terms.groupBy("source").agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = FreqItems.perGroup(terms, Seq("source"), F.col("term"), m, m)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, term, est) = (r.getString(0), r.getString(2), r.getLong(3))
      val truth = trueCounts((src, term))
      assert(est <= truth, s"$src/$term: est $est > true $truth")
      assert(truth - est <= totals(src) / (m + 1),
        s"$src/$term: est $est vs true $truth exceeds n/(m+1)=${totals(src) / (m + 1)}")
    }
  }

  test("results are invariant to input partitioning (mergeable summaries)") {
    val a = FreqItems.perGroup(terms.repartition(1), Seq("source"), F.col("term"), 64, 5)
      .collect().map(_.toSeq).toSet
    val b = FreqItems.perGroup(terms.repartition(13), Seq("source"), F.col("term"), 64, 5)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  private lazy val weighted = graft.Tables(spark, SF, "events")
    .select(F.col("event_type"), F.col("user_id"),
      (graft.Tables.dec2(F.col("value")) * 100).cast("long").as("wc"))

  test("weighted sketch with capacity >= terms equals the exact weight ranking") {
    val exact = weighted.groupBy("event_type", "user_id").agg(F.sum("wc").as("n"))
      .withColumn("rnk", F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
          .orderBy(F.col("n").desc, F.col("user_id").cast("string").asc)))
      .filter(F.col("rnk") <= 3)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getLong(1).toString, r.getLong(2))).toSet
    val sketch = FreqItems.perGroupWeighted(weighted, Seq("event_type"),
      F.col("user_id"), F.col("wc"), 256, 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(sketch == exact)
  }

  test("weighted sketch honors the generalized bound with n = total weight") {
    val m = 8
    val totals = weighted.groupBy("event_type").agg(F.sum("wc").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = weighted.groupBy("event_type", "user_id").agg(F.sum("wc").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1).toString) -> r.getLong(2)).toMap
    val rows = FreqItems.perGroupWeighted(weighted, Seq("event_type"),
      F.col("user_id"), F.col("wc"), m, m).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (et, term, est) = (r.getString(0), r.getString(2), r.getLong(3))
      val t = truth((et, term))
      assert(est <= t, s"$et/$term: est $est > true $t")
      assert(t - est <= totals(et) / (m + 1),
        s"$et/$term: underestimate exceeds W/(m+1)=${totals(et) / (m + 1)}")
    }
  }

  test("offset-buffer offer matches the textbook Misra-Gries loop on random streams") {
    // reference: the literal textbook decrement-all loop over absolute counters
    def refOffer(buf: scala.collection.mutable.HashMap[String, Long], cap: Int,
                 term: String, w: Long): Unit =
      buf.get(term) match {
        case Some(c) => buf.update(term, c + w)
        case None if buf.size < cap => buf.update(term, w)
        case None =>
          var rem = w
          while (rem > 0) {
            if (buf.size < cap) { buf.update(term, rem); rem = 0 }
            else {
              val minC = buf.valuesIterator.min
              val dec = math.min(rem, minC)
              val dead = buf.iterator.collect { case (t, c) if c == dec => t }.toList
              buf.mapValuesInPlace((_, c) => c - dec)
              dead.foreach(buf.remove)
              rem -= dec
            }
          }
      }
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { trial =>
      val cap = 1 + rnd.nextInt(8)
      val agg = FreqItemsSketch(null, cap)
      val fast = new MGBuffer
      val ref = scala.collection.mutable.HashMap[String, Long]()
      (0 until 500).foreach { _ =>
        val term = s"t${rnd.nextInt(30)}"
        val w = 1L + rnd.nextInt(20)
        agg.offerTo(fast, term, w)
        refOffer(ref, cap, term, w)
        val eff = fast.m.map { case (t, r) => t -> (r - fast.offset) }
        assert(eff == ref, s"trial $trial: offset buffer diverged from textbook MG")
      }
    }
  }

  test("weighted sketch is partition-invariant and SQL-registered") {
    val a = FreqItems.perGroupWeighted(weighted.repartition(1), Seq("event_type"),
      F.col("user_id"), F.col("wc"), 256, 3).collect().map(_.toSeq).toSet
    val b = FreqItems.perGroupWeighted(weighted.repartition(13), Seq("event_type"),
      F.col("user_id"), F.col("wc"), 256, 3).collect().map(_.toSeq).toSet
    assert(a == b)
    graft.GraftExtensions.register(spark)
    weighted.createOrReplaceTempView("wtmp")
    val viaSql = spark.sql(
      """SELECT event_type, freq_items_weighted(CAST(user_id AS STRING), wc, 256) AS fi
        |FROM wtmp GROUP BY 1""".stripMargin).collect()
    assert(viaSql.nonEmpty && viaSql.forall(!_.isNullAt(1)))
  }
}
