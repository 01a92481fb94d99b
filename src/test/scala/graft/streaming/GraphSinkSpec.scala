package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.graph.GraphAlgs

/** Top level: Spark encoders cannot instantiate test-class inner types. */
final case class CCEdge(src: Long, dst: Long)

/** Incremental CC must equal batch CC over the full edge history —
  * including components that only merge across micro-batches — and be
  * idempotent under replay. */
class GraphSinkSpec extends SparkSpec {
  private type E = CCEdge
  private def E(s: Long, d: Long): CCEdge = CCEdge(s, d)

  test("streaming incremental components equal batch CC over all edges") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("ccsink").toString
    val in = MemoryStream[E]
    val q = GraphSink.start(in.toDF(), dir)
    try {
      // batch 1: {1,2} {3,4} {7,8,9} as separate components
      val b1 = Seq(E(1, 2), E(3, 4), E(7, 8), E(8, 9))
      // batch 2 merges {1,2}+{3,4} via 2-3, starts {5,6}, grows {7,8,9}
      val b2 = Seq(E(2, 3), E(5, 6), E(9, 10))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val all = (b1 ++ b2).toDF()
      val undirected = all.unionByName(
        all.select(F.col("dst").as("src"), F.col("src").as("dst"))).distinct()
      val vertices = undirected.select(F.col("src").as("vid")).distinct()
      val expect = GraphAlgs.connectedComponents(vertices, undirected)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def state() = GraphSink.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(state() === expect)
      // replaying a completed batch is a no-op
      GraphSink.applyBatch(b1.toDF(), dir, 0L)
      assert(state() === expect)
    } finally q.stop()
  }
}
