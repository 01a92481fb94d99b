package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

case class AuEv(user_id: Long, ts: java.sql.Timestamp)

class ActiveUsersSinkSpec extends SparkSpec {

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("maintained DAU/WAU/MAU equals the batch query over full history") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ausink").toString
    val evs = graft.Tables(spark, SF, "events")
      .select("user_id", "ts").collect()
      .map(r => AuEv(r.getLong(0), r.getTimestamp(1))).toSeq
      .sortBy(_.ts.getTime)
    val in = MemoryStream[AuEv]
    val q = ActiveUsersSink.start(in.toDF(), dir)
    try {
      evs.grouped(math.max(1, evs.size / 5)).foreach { g =>
        in.addData(g: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val maintained = asSet(ActiveUsersSink.read(spark, dir))
    val batch = asSet(graft.olap.OlapSeriesQueries.qActiveUsers(spark, SF))
    assert(maintained == batch && maintained.nonEmpty)
  }

  test("replayed batches are no-ops; state is one bitmap row per day") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ausink2").toString
    def ev(u: Long, day: Long) =
      AuEv(u, new java.sql.Timestamp(day * 86400000L))
    val b0 = Seq(ev(1, 19700), ev(2, 19700), ev(1, 19701)).toDF()
    val b1 = Seq(ev(2, 19701), ev(3, 19701), ev(1, 19700)).toDF()
    ActiveUsersSink.applyBatch(b0, dir, 0L)
    ActiveUsersSink.applyBatch(b1, dir, 1L)
    val before = asSet(ActiveUsersSink.read(spark, dir))
    ActiveUsersSink.applyBatch(b1, dir, 1L) // redelivery
    ActiveUsersSink.applyBatch(b0, dir, 0L) // stale redelivery
    assert(asSet(ActiveUsersSink.read(spark, dir)) == before)
    // day 19700: users {1,2}; day 19701: {1,2,3}; WAU(19701) = {1,2,3}
    val by = before.map(t => t._1 -> t).toMap
    assert(by(19700L)._2 == 2 && by(19701L)._2 == 3)
    assert(by(19701L)._3 == 3 && by(19701L)._4 == 3)
    // state = exactly one bitmap row per day in the latest snapshot
    val days = Files.list(java.nio.file.Paths.get(dir)).iterator()
    var latest: java.nio.file.Path = null
    while (days.hasNext) { val p = days.next(); if (latest == null ||
      p.getFileName.toString > latest.getFileName.toString) latest = p }
    val snap = spark.read.parquet(latest.toString)
    assert(snap.count() == 2 && snap.groupBy("day").count()
      .filter(F.col("count") > 1).count() == 0)
  }

  test("bitmap_andnot returns a composable serialized difference bitmap") {
    import spark.implicits._
    val df = Seq((1L, 0L), (2L, 0L), (3L, 0L), (2L, 1L), (4L, 1L)).toDF("id", "g")
      .groupBy("g").agg(graft.operators.BitmapDistinct.buildAgg(F.col("id")).as("bm"))
    val Array(a, b) = df.orderBy("g").collect().map(_.getAs[Array[Byte]]("bm"))
    val diff = Seq((a, b)).toDF("a", "b")
      .select(graft.operators.BitmapDistinct.cardinality(
        graft.operators.BitmapDistinct.andNot(F.col("a"), F.col("b"))).as("n"),
        graft.operators.BitmapDistinct.andCardinality(
          graft.operators.BitmapDistinct.andNot(F.col("a"), F.col("b")), F.col("a")).as("sub"))
      .collect().head
    assert(diff.getLong(0) == 2L) // {1,3}
    assert(diff.getLong(1) == 2L) // difference is a subset of a, still composable
    // SQL registration
    val viaSql = spark.sql(
      "SELECT bitmap_cardinality(bitmap_andnot(bitmap_build(id), bitmap_build(id2))) AS n " +
        "FROM VALUES (1L, 2L), (2L, 3L), (3L, 9L) t(id, id2)").collect().head.getLong(0)
    assert(viaSql == 1L) // {1,2,3} \ {2,3,9} = {1}
  }

  test("the maintained cohort matrix equals the batch q_cohort_matrix") {
    val dir = Files.createTempDirectory("au_cohort").toString
    val ev = graft.Tables(spark, SF, "events").select("user_id", "ts")
    val b0 = ev.filter(F.pmod(F.col("user_id"), F.lit(2L)) === 0L)
    val b1 = ev.filter(F.pmod(F.col("user_id"), F.lit(2L)) === 1L)
    ActiveUsersSink.applyBatch(b0, dir, 0L)
    ActiveUsersSink.applyBatch(b1, dir, 1L)
    ActiveUsersSink.applyBatch(b1, dir, 1L) // replay
    val got = ActiveUsersSink.cohortRead(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val exp = graft.olap.OlapSeriesQueries.qCohortMatrix(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == exp)
  }
}
