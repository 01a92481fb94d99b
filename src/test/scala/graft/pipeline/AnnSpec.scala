package graft.pipeline

import graft.SparkSpec

/** ANN invariants + LSH recall against the brute-force baseline. */
class AnnSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("brute-force top-k: k rows per query, ranks 1..k, cosine non-increasing") {
    val rows = AnnQueries.sAnnTopk(spark, SF).collect()
      .groupBy(_.getLong(0))
    assert(rows.size == AnnQueries.NQueries)
    rows.foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(2))
      assert(byRank.map(_.getInt(2)).toSeq == (1 to AnnQueries.TopK))
      val cs = byRank.map(_.getLong(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("L2 top-k matches a driver-side exact recomputation") {
    import org.apache.spark.sql.{functions => F}
    val vecs = graft.Tables(spark, SF, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      // same shape as the query: |a|^2 + |b|^2 - 2ab from ordered folds
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      dot(a, a) + dot(b, b) - 2.0 * dot(a, b)
    }
    val got = AnnQueries.sAnnL2(spark, SF).collect()
      .groupBy(_.getLong(0))
    assert(got.size == AnnQueries.NQueries)
    got.foreach { case (q, rs) =>
      val expected = vecs.keys.filter(_ != q).toSeq
        .map(n => (n, d2(vecs(q), vecs(n))))
        .sortBy { case (n, d) => (d, n) }.take(AnnQueries.TopK).map(_._1)
      val byRank = rs.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
      assert(byRank == expected, s"query $q")
    }
  }

  test("matrix sign buckets equal the per-plane signature expressions") {
    import org.apache.spark.sql.{functions => F}
    val e = graft.Tables(spark, SF, "embeddings").limit(200)
    val diff = e.select(
      AnnQueries.signatures(F.col("embedding")).as("b"),
      F.array((0 until AnnQueries.Tables_).map(t =>
        AnnQueries.signature(F.col("embedding"), t)): _*).as("ref"))
      .filter(F.col("b") =!= F.col("ref")).count()
    assert(diff == 0)
  }

  test("LSH ANN recall@10 vs brute force is usable") {
    val exact = pairs(AnnQueries.sAnnTopk(spark, SF))
    val approx = pairs(AnnQueries.sAnnLsh(spark, SF))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@10 = $recall")
    // and every LSH hit is a genuine corpus neighbor of the query
    approx.foreach { case (q, n) => assert(q < AnnQueries.NQueries && n != q) }
  }

  test("PQ ANN recall@10 vs brute force is usable, k rows per query") {
    val exact = pairs(AnnQueries.sAnnTopk(spark, SF))
    val out = AnnQueries.sAnnPq(spark, SF)
    val approx = pairs(out)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@10 = $recall")
    // exact-re-rank contract: k rows per query, ranks 1..k
    out.collect().groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to AnnQueries.TopK))
    }
  }

  test("IVF ANN recall@10 vs brute force beats random scan fraction") {
    val exact = pairs(AnnQueries.sAnnTopk(spark, SF))
    val approx = pairs(AnnQueries.sAnnIvf(spark, SF))
    val recall = (exact & approx).size.toDouble / exact.size
    // probing 4/16 lists scans ~25% of the corpus; clustered probing must
    // beat that baseline
    assert(recall >= 0.3, s"recall@10 = $recall")
  }

  test("kv-served IVF returns the SAME rows as s_ann_ivf and prunes the store") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.kvconnector.{KVScan, KVSegmentStore}
    val frame = AnnQueries.sAnnIvf(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sorted.toSeq
    val served = AnnQueries.sAnnIvfKv(spark, SF)
    val got = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sorted.toSeq
    assert(got == frame && got.nonEmpty,
      s"kv-served IVF diverged: ${got.size} vs ${frame.size} rows")
    // the probe's static IN set pruned inverted-list segments at plan
    // time (the whole point: the index read never touches the store).
    // the entry localCheckpoints, so re-run the pruned read directly
    val store = AnnQueries.lastIvfSeg.get.toString
    val total = KVSegmentStore.readManifest(store).size
    // the SAME multi-key IN shape the entry issues (not a single ===):
    // the claim is that the NProbe probed lists prune as an IN set
    def be(v: Long): Array[Byte] = graft.kv.KVStore.beLong(v)
    val probe = spark.read.format("graft-kv").load(store)
      .filter(org.apache.spark.sql.functions.col("k")
        .isin(Seq(be(0L), be(1L), be(2L)): _*))
    probe.collect()
    val kv = collectExec(probe) {
      case b: BatchScanExec if b.scan.isInstanceOf[KVScan] =>
        b.scan.asInstanceOf[KVScan]
    }.head
    assert(kv.lastPlanned < total,
      s"list probe scheduled ${kv.lastPlanned}/$total segments — no pruning")
  }

  test("ANN trio recall/scan-fraction table (one place, measured)") {
    import org.apache.spark.sql.{functions => F}
    val exact = pairs(AnnQueries.sAnnTopk(spark, SF))
    val emb = graft.Tables(spark, SF, "embeddings")
    val n = emb.count()
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      (exact & pairs(df)).size.toDouble / exact.size
    // LSH: MEASURED scan fraction = distinct (query, candidate) pairs the
    // bucket join actually scores, over the full scan's NQueries*(n-1)
    val buckets = emb.select(F.col("vec_id"),
      F.posexplode(AnnQueries.signatures(F.col("embedding"))).as(Seq("t", "bucket")))
    val q = buckets.filter(F.col("vec_id") < AnnQueries.NQueries)
      .select(F.col("vec_id").as("q_id"), F.col("t"), F.col("bucket"))
    val lshCand = q.join(buckets, Seq("t", "bucket"))
      .filter(F.col("vec_id") =!= F.col("q_id"))
      .select("q_id", "vec_id").distinct().count()
    val lshFrac = lshCand.toDouble / (AnnQueries.NQueries * (n - 1))
    val lshRecall = recallOf(AnnQueries.sAnnLsh(spark, SF))
    // IVF: structural scan fraction = NProbe probed lists of NCentroids
    val ivfFrac = AnnQueries.NProbe.toDouble / AnnQueries.NCentroids
    val ivfRecall = recallOf(AnnQueries.sAnnIvf(spark, SF))
    // PQ: full scan in the COMPRESSED domain (4-bit codes); raw-vector
    // scan fraction = the exact re-rank depth
    val pqFrac = AnnQueries.RerankDepth.toDouble / (n - 1)
    val pqRecall = recallOf(AnnQueries.sAnnPq(spark, SF))
    info(f"ANN recall@10 / raw-vector scan fraction at $SF%s (n=$n%d):")
    info(f"  LSH recall=$lshRecall%.3f scan=$lshFrac%.3f (measured bucket join)")
    info(f"  IVF recall=$ivfRecall%.3f scan=$ivfFrac%.3f (NProbe/NCentroids)")
    info(f"  PQ  recall=$pqRecall%.3f rerank=$pqFrac%.3f (+full 4-bit ADC pass)")
    // each path must beat a RANDOM scan of the same fraction, whose
    // expected recall IS the fraction — the whole point of the index
    assert(lshRecall > lshFrac, f"LSH $lshRecall%.3f <= random $lshFrac%.3f")
    assert(ivfRecall > ivfFrac, f"IVF $ivfRecall%.3f <= random $ivfFrac%.3f")
    assert(pqRecall > pqFrac, f"PQ $pqRecall%.3f <= random rerank $pqFrac%.3f")
  }
}
