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

  test("IVF ANN recall@10 vs brute force beats random scan fraction") {
    val exact = pairs(AnnQueries.sAnnTopk(spark, SF))
    val approx = pairs(AnnQueries.sAnnIvf(spark, SF))
    val recall = (exact & approx).size.toDouble / exact.size
    // probing 4/16 lists scans ~25% of the corpus; clustered probing must
    // beat that baseline
    assert(recall >= 0.3, s"recall@10 = $recall")
  }
}
