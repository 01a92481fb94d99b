package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.JourneyStream.{JEv, SessionPath}

/** Streaming journeys must equal the batch sessionize+path replica
  * (including the cross-batch out-of-order gap-boundary case), and
  * piping the emitted paths through TopKSink must maintain the exact
  * journey counts. */
class JourneyStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  private def runBatches(batches: Seq[Seq[JEv]]): Seq[SessionPath] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[JEv]
    val q = JourneyStream.paths(in.toDF())
      .writeStream.format("memory").queryName("j_paths")
      .outputMode("append").start()
    try {
      batches.foreach { g => in.addData(g: _*); q.processAllAvailable() }
      val maxT = batches.flatten.map(_.ts.getTime).max
      (1 to 3).foreach { i =>
        in.addData(JEv(-1, ts(maxT + i * 7_200_000L), -i, "click"))
        q.processAllAvailable()
      }
      spark.table("j_paths").as[SessionPath].collect().toSeq
        .filter(_.user_id >= 0)
    } finally { q.stop(); spark.catalog.dropTempView("j_paths") }
  }

  /** Batch replica: (t, id) sort per user, gap fold, 3-prefix path. */
  private def expected(evs: Seq[JEv]): Seq[SessionPath] =
    evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      val sessions = sorted.foldLeft(Vector.empty[Vector[JEv]]) { (acc, e) =>
        if (acc.nonEmpty &&
            e.ts.getTime - acc.last.last.ts.getTime <= JourneyStream.GapMs)
          acc.init :+ (acc.last :+ e)
        else acc :+ Vector(e)
      }
      sessions.map { s =>
        SessionPath(u, s.head.ts.getTime, s.last.ts.getTime, s.size.toLong,
          s.take(3).map(_.event_type).mkString(">"))
      }
    }

  test("cross-batch out-of-order event near a gap boundary keeps one path") {
    val base = 1_700_000_000_000L
    val G = JourneyStream.GapMs
    val b1 = Seq(JEv(1, ts(base), 1, "view"), JEv(1, ts(base + 60_000), 2, "click"))
    val b2 = Seq(JEv(1, ts(base + 60_000 + G + 120_000), 3, "purchase"))
    val b3 = Seq(JEv(1, ts(base + 200_000), 4, "signup")) // admissible, merges all
    val got = runBatches(Seq(b1, b2, b3))
    val exp = expected(b1 ++ b2 ++ b3)
    assert(exp.size == 1 && exp.head.path == "view>click>signup", exp)
    assert(got.toSet === exp.toSet, got.sortBy(_.start_ms))
  }

  test("replayed sf0.001 history matches the batch paths; TopKSink maintains exact journey counts") {
    val evs = graft.Tables(spark, SF, "events")
      .select("user_id", "ts", "event_id", "event_type")
      .limit(800).collect()
      .map(r => JEv(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .toSeq
    val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
    val got = runBatches(sorted.grouped(math.max(1, sorted.size / 5)).toSeq)
    val exp = expected(evs)
    assert(got.size == exp.size && got.toSet === exp.toSet)

    // compose: emitted paths → TopKSink(termCol = "path"), 3 batches + replay
    import spark.implicits._
    val dir = Files.createTempDirectory("journeys").toString
    val chunks = got.grouped(math.max(1, got.size / 3)).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      TopKSink.applyBatch(c.toDF(), dir, i.toLong, capacity = 256, termCol = "path")
    }
    TopKSink.applyBatch(chunks.head.toDF(), dir, 0L, capacity = 256, termCol = "path")
    val maintained = TopKSink.read(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    val true_ = got.groupBy(_.path).view.mapValues(_.size.toLong).toMap
    // distinct paths ≤ capacity → Misra-Gries is exact
    assert(true_.size <= 256)
    assert(maintained == true_)
  }
}
