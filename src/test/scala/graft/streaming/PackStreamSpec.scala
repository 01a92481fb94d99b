package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import PackStream.{Doc, Slot}

/** Streaming sequence packing: placements must equal the batch greedy
  * fold over the arrival sequence, with the open bin carried across
  * micro-batches in O(1) state. */
class PackStreamSpec extends SparkSpec {

  private def greedy(docs: Seq[Doc], cap: Long): Seq[Slot] = {
    var bin = 0L
    var fill = 0L
    docs.map { d =>
      if (fill > 0 && fill + d.n > cap) { bin += 1; fill = 0 }
      val s = Slot(d.source, d.doc_id, bin, fill, d.n)
      fill += d.n
      s
    }
  }

  test("streaming packing equals the greedy fold and carries state across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Doc]
    val q = PackStream.pack(in.toDS(), cap = 100L)
      .writeStream.format("memory").queryName("pack_out")
      .outputMode(OutputMode.Append).start()
    try {
      val b1 = Seq(Doc("a", 1, 60), Doc("a", 2, 50), Doc("b", 3, 120))
      val b2 = Seq(Doc("a", 4, 45), Doc("a", 5, 10), Doc("b", 6, 5))
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("pack_out").as[Slot].collect().toSet
      val expect = (greedy(Seq(Doc("a", 1, 60), Doc("a", 2, 50), Doc("a", 4, 45), Doc("a", 5, 10)), 100L)
        ++ greedy(Seq(Doc("b", 3, 120), Doc("b", 6, 5)), 100L)).toSet
      assert(got == expect, s"got $got\nexpect $expect")
      // the open bin carried across batches: doc 4 lands in source a's
      // still-open bin 1 at offset 50; the oversized doc 3 had its own bin
      assert(got.contains(Slot("a", 4, 1, 50, 45)))
      assert(got.contains(Slot("a", 5, 2, 0, 10)))
      assert(got.contains(Slot("b", 6, 1, 0, 5)))
    } finally q.stop()
  }
}
