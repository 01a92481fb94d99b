package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Semantic properties of the rows-only dedup operators, checked against
  * the exact-Jaccard baseline on the sf0.001 corpus (all deterministic:
  * fixed data, fixed hash functions). */
class DedupSpec extends SparkSpec {

  private def jacPairs(min: Double): Set[(Long, Long)] =
    DedupQueries.dJaccardPairs(spark, SF)
      .filter(F.col("jac") >= min)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact dedup partitions the corpus (copy counts sum to row count)") {
    val total = graft.Tables(spark, SF, "documents").count()
    val agg = DedupQueries.dExactDup(spark, SF)
      .agg(F.sum("n_copies"), F.min("n_copies")).head()
    assert(agg.getLong(0) == total)
    assert(agg.getLong(1) >= 1L)
  }

  test("jaccard pairs respect the 0.5 threshold and ordering a<b") {
    val rows = DedupQueries.dJaccardPairs(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0)
    }
  }

  test("one-pass shingle MinHash equals the explode formulation bit-for-bit") {
    val sh = DedupQueries.wordShingles(graft.Tables(spark, SF, "documents"))
    val base = sh.select(F.col("doc_id"), F.xxhash64(F.col("s")).as("h"))
    val mins = (0 until DedupQueries.MinHashK).map { i =>
      F.min(F.xxhash64(F.lit(i), F.col("h"))).as(s"m$i")
    }
    val explodeForm = base.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    val onePass = graft.Tables(spark, SF, "documents")
      .filter(F.size(F.split(F.col("text"), " ")) >= 3)
      .select(F.col("doc_id"),
        graft.functions.TextFunctions
          .wordShingleMinHash(F.col("text"), 3, DedupQueries.MinHashK).as("mh"))
    val diff = onePass.join(explodeForm, "doc_id")
      .filter((0 until DedupQueries.MinHashK).map(i =>
        F.col("mh").getItem(i) =!= F.col(s"m$i")).reduce(_ || _))
      .count()
    assert(diff == 0)
    assert(onePass.count() == explodeForm.count())
  }

  test("one-pass SimHash equals the explode formulation bit-for-bit") {
    val tok = graft.Tables(spark, SF, "documents")
      .select(F.col("doc_id"), F.explode(F.split(F.col("text"), " ")).as("w"))
      .select(F.col("doc_id"), F.xxhash64(F.col("w")).as("h"))
    val bitSums = (0 until 64).map { j =>
      F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$j")
    }
    val explodeForm = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(F.col("doc_id"),
        (0 until 64).map(j =>
          F.when(F.col(s"b$j") > 0, F.lit(1L << j)).otherwise(F.lit(0L)))
          .reduce(_ bitwiseOR _).as("efp"))
    val onePass = graft.Tables(spark, SF, "documents")
      .select(F.col("doc_id"),
        graft.functions.TextFunctions.wordSimHash(F.col("text")).as("fp"))
    val diff = onePass.join(explodeForm, "doc_id")
      .filter(F.col("fp") =!= F.col("efp")).count()
    assert(diff == 0)
  }

  test("minhash-LSH candidates cover every pair with Jaccard >= 0.85") {
    val cand = DedupQueries.dMinhashLsh(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val high = jacPairs(0.85)
    assert(high.nonEmpty)
    val missed = high -- cand
    assert(missed.isEmpty, s"LSH missed high-Jaccard pairs: $missed")
  }

  test("simhash pairs are hamming<=3 and cover near-identical docs") {
    val rows = DedupQueries.dSimhash(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(2) <= 3 && r.getLong(0) < r.getLong(1)))
    val sim = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val nearIdentical = jacPairs(0.95)
    val missed = nearIdentical -- sim
    assert(missed.size <= nearIdentical.size / 5,
      s"simhash missed too many near-identical pairs: $missed")
  }

  test("embed dup pairs are ordered and above threshold") {
    val rows = DedupQueries.dEmbedDup(spark, SF).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 400000L) // floor(cs*1e6) with cs >= 0.4
    }
  }

  test("semdedup: precision 1 vs the exact baseline, keep-min, measured recall") {
    val out = DedupQueries.dSemDedup(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // total partition of the corpus into keep/drop
    val n = graft.Tables(spark, SF, "embeddings").count()
    assert(out.length == n)
    val dropped = out.filter(_._3 == 0L).map(_._1).toSet
    // the exact all-pairs baseline (a<b, cos >= 0.4)
    val exactPairs = DedupQueries.dEmbedDup(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // PRECISION = 1: every drop has a smaller exact-threshold witness —
    // the within-cluster verify is exact cosine, so no false drops exist
    dropped.foreach { b =>
      assert(exactPairs.exists(_._2 == b), s"dropped $b has no exact witness")
    }
    // keep-min: a doc with NO smaller threshold partner anywhere is kept
    val exactDrops = exactPairs.map(_._2)
    out.filter(t => !exactDrops.contains(t._1)).foreach(t =>
      assert(t._3 == 1L, s"${t._1} dropped without any exact witness"))
    // RECALL vs the baseline keep-min rule: pairs split across clusters
    // are missed by design; the cluster count bounds the loss
    val recall = dropped.size.toDouble / exactDrops.size
    info(f"semdedup recall vs exact keep-min drops: $recall%.3f " +
      s"(${dropped.size}/${exactDrops.size})")
    assert(recall >= 0.3, s"recall $recall")
    // deterministic end to end (trainer draws are hash-based)
    val again = DedupQueries.dSemDedup(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }

  test("LSH-verified pairs equal the exact quadratic baseline, jac included") {
    // the whole point of the scale path: candidates ⊆ pairs via LSH, then
    // exact verification must reproduce d_jaccard_pairs bit for bit
    val exact = DedupQueries.dJaccardPairs(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val verified = DedupQueries.dLshVerified(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(verified == exact)
  }

  test("dup groups: total partition, canonical min, pairs co-clustered") {
    val docs = graft.Tables(spark, SF, "documents")
    val groups = DedupQueries.dDupGroups(spark, SF).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.size == docs.count()) // every document, exactly once
    groups.foreach { case (d, keep) =>
      assert(keep <= d)               // canonical = min id of the cluster
      assert(groups(keep) == keep)    // the kept doc keeps itself
    }
    // near-dup pairs land in the same cluster; non-paired docs are alone
    val pairs = jacPairs(0.5)
    pairs.foreach { case (a, b) => assert(groups(a) == groups(b), s"($a,$b)") }
    val paired = pairs.flatMap(p => Seq(p._1, p._2))
    groups.collect { case (d, keep) if !paired.contains(d) =>
      assert(keep == d, s"unpaired doc $d must keep itself")
    }
  }
}
