package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.graph.GraphAlgs

/** Top level: Spark encoders cannot instantiate test-class inner types. */
final case class PREdge(src: Long, dst: Long)

/** Warm-started incremental PageRank must track the batch fixed point of
  * the full edge history (the recurrence contracts to the same fixed
  * point from any start — a micro-batch only needs a few refresh rounds
  * after a small delta) and be idempotent under replay. */
class RankSinkSpec extends SparkSpec {
  private def E(s: Long, d: Long): PREdge = PREdge(s, d)

  test("incremental warm-start ranks track the full-history fixed point") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("prsink").toString
    // base graph: 20-node expander-ish digraph (cycle + long chords —
    // small diameter so power iteration mixes fast; a bare cycle would
    // need ~n rounds to move mass around, defeating the warm start)
    val b1 = (0L until 20L).flatMap(i =>
      Seq(E(i, (i + 1) % 20), E(i, (i * 7 + 3) % 20))) ++
      Seq(5L, 11L, 17L).map(i => E(i, 0L))
    // delta: three new edges re-routing some mass toward 12
    val b2 = Seq(E(3, 12), E(9, 12), E(19, 12))
    val in = MemoryStream[PREdge]
    val q = RankSink.start(in.toDF(), dir)
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val all = (b1 ++ b2).toDF()
      val vertices = all.select(F.col("src").as("vid"))
        .unionByName(all.select(F.col("dst").as("vid"))).distinct()
      val ref = GraphAlgs.pagerank(vertices, all.select("src", "dst"), iters = 30)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      def state() = RankSink.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val got = state()
      assert(got.keySet === ref.keySet)
      // every vertex within 5% of the fixed point after 6 warm rounds
      for ((vid, pr) <- got) {
        val e = ref(vid)
        assert(math.abs(pr - e).toDouble / e < 0.05,
          s"vid=$vid got=$pr expect=$e")
      }
      // the delta-target/hub ordering agrees with the fixed point
      assert((got(0L) > got(12L)) === (ref(0L) > ref(12L)))
      // total mass bounded by the teleport budget (dangling mass dropped)
      assert(got.values.sum <= 1000000000000L)
      // replaying a completed batch is a no-op
      RankSink.applyBatch(b1.toDF(), dir, 0L)
      assert(state() === got)
    } finally q.stop()
  }
}
