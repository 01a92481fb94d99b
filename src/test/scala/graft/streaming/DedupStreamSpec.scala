package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec
import graft.pipeline.DedupQueries

/** Streaming LSH near-dup detection: candidate quality vs the exact
  * batch baseline, canonical-star connectivity, and bounded bucket state. */
class DedupStreamSpec extends SparkSpec {

  private val Base = 24 * 60 * 60 * 1000L
  private def ts(i: Long): Timestamp = new Timestamp(Base + i * 1000L)

  test("streaming LSH connects every high-Jaccard pair through its bucket canonical") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.Tables(spark, SF, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    val in = MemoryStream[(Long, Timestamp, String)]
    val q = DedupStream.lshCandidates(
      in.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("lsh_cand")
      .outputMode(OutputMode.Append).start()
    try {
      // three micro-batches in arrival order — near-dup pairs often
      // straddle a batch boundary, which is the case worth testing
      val batches = docs.zipWithIndex.map { case ((id, t), i) => (id, ts(i), t) }
        .grouped(math.max(1, docs.length / 3 + 1)).toSeq
      batches.foreach { b => in.addData(b); q.processAllAvailable() }

      val cand = spark.table("lsh_cand").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cand.nonEmpty)

      // union-find over the emitted star edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      cand.foreach { case (a, b) => parent(find(a)) = find(b) }

      val high = DedupQueries.dJaccardPairs(spark, SF)
        .filter(F.col("jac") >= 0.85)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(high.nonEmpty)
      val disconnected = high.filter { case (a, b) => find(a) != find(b) }
      assert(disconnected.isEmpty,
        s"streaming LSH failed to connect high-Jaccard pairs: $disconnected")

      // O(1)-per-bucket state: total state rows ≤ distinct buckets touched
      val progress = q.recentProgress.flatMap(p => Option(p.stateOperators))
        .flatten.map(_.numRowsTotal).lastOption
      assert(progress.isDefined && progress.get > 0)
      assert(progress.get <= docs.length.toLong * 16L,
        s"state must be bounded by buckets, got ${progress.get}")
    } finally q.stop()
  }

  test("idle buckets are evicted once the watermark passes their horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = DedupStream.lshCandidates(in.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("lsh_evict")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, ts(0), "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      val before = q.recentProgress.flatMap(p => Option(p.stateOperators))
        .flatten.map(_.numRowsTotal).last
      assert(before > 0L)
      // two hours later: watermark passes every idle bucket's horizon
      in.addData((2L, ts(7200), "zeta eta theta iota kappa"))
      q.processAllAvailable()
      in.addData((3L, ts(7201), "lambda mu nu xi omicron"))
      q.processAllAvailable()
      val after = q.recentProgress.flatMap(p => Option(p.stateOperators))
        .flatten.map(_.numRowsTotal).last
      assert(after < before + 32L,
        s"doc-1 buckets must be evicted: before=$before after=$after")
    } finally q.stop()
  }
}
