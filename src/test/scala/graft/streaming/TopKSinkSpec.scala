package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import EventStream.Ev

/** The stream-maintained global heavy-hitter sketch must be EXACT while
  * lifetime distinct terms ≤ capacity, keep the Misra-Gries bound
  * (est ≤ true ≤ est + N/(cap+1)) past it, and be idempotent under batch
  * replay. */
class TopKSinkSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60 * 1000L)
  private def ev(id: Long, user: Long): Ev = Ev(user, ts(id), "click", 1.0)

  test("exact regime: maintained top-k equals true counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("topk").toString
    val in = MemoryStream[Ev]
    val q = TopKSink.start(in.toDF(), dir, capacity = 8)
    try {
      // users 1,2,3 with counts accumulating ACROSS batches: 5, 3, 2
      val b1 = Seq(ev(1, 1), ev(2, 1), ev(3, 2), ev(4, 3), ev(5, 1))
      val b2 = Seq(ev(6, 1), ev(7, 2), ev(8, 2), ev(9, 1), ev(10, 3))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      def state() = TopKSink.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
      assert(state() === List((1L, "1", 5L), (2L, "2", 3L), (3L, "3", 2L)))
      // replaying an already-complete batch must be a no-op
      TopKSink.applyBatch(b2.toDF(), dir, 1L, capacity = 8)
      assert(state() === List((1L, "1", 5L), (2L, "2", 3L), (3L, "3", 2L)))
    } finally q.stop()
  }

  test("approximate regime: MG bound holds against the full stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("topk_apx").toString
    val in = MemoryStream[Ev]
    val q = TopKSink.start(in.toDF(), dir, capacity = 2)
    try {
      // heavy user 7 (12 arrivals) vs 8 one-off users, split over batches
      var id = 0L
      def mk(users: Seq[Long]) = users.map { u => id += 1; ev(id, u) }
      val b1 = mk(Seq(7, 7, 7, 10, 7, 11, 7, 12, 7))
      val b2 = mk(Seq(7, 13, 7, 14, 7, 15, 7, 16, 7, 17, 7))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val n = (b1 ++ b2).size.toLong
      val got = TopKSink.read(spark, dir)
        .collect().map(r => (r.getString(1), r.getLong(2))).toMap
      // the heavy hitter survives at rank 1 with the MG guarantee
      val est = got("7")
      assert(est <= 12L && 12L <= est + n / 3,
        s"estimate $est violates MG bound for true count 12 (n=$n, cap=2)")
      assert(TopKSink.read(spark, dir).collect().head.getString(1) === "7")
    } finally q.stop()
  }
}
