package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

class TextSpec extends SparkSpec {

  test("fused two-model trigram training equals two separate trainings") {
    val docs = graft.Tables(spark, SF, "documents")
      .filter(F.length(F.col("text")) >= 3)
    val flag = F.col("lang") === "en"
    val (corpus, target) = TextQueries.trigramModels2(docs, flag)
    assert(corpus.toMap === TextQueries.trigramModel(docs).toMap)
    // both fused models prune support by CORPUS frequency rank (one
    // shared top-K — the d_dsir contract), so the separate-training
    // equivalent of the target model is the UNPRUNED subset training
    // restricted to the pruned corpus model's keys; r6t ratios are
    // untouched by pruning (probabilities precede the support cut)
    val corpusKeys = corpus.map(_._1).toSet
    val sep = TextQueries.trigramModel(docs.filter(flag),
        topK = Int.MaxValue).toMap
    assert(target.toMap ===
      sep.view.filterKeys(corpusKeys.contains).toMap)
    // the pruning BITES on this corpus (otherwise the bound is untested)
    assert(corpus.size == TextQueries.TrigramModelTopK)
    assert(sep.size > target.size)
  }

  test("packed per-doc trigram histogram equals the position-explode counts") {
    val docs = graft.Tables(spark, SF, "documents")
      .filter(F.length(F.col("text")) >= 3)
    val packed = docs
      .select(F.explode(
        graft.functions.TextFunctions.trigramCounts(F.col("text"))).as("pk"))
      .select(F.expr("pk >> 32").cast("int").as("k"),
        F.expr("pk & 4294967295").as("c"))
      .groupBy("k").agg(F.sum("c").as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val exploded = docs
      .select(F.explode(
        F.transform(F.sequence(F.lit(1), F.length(F.col("text")) - 2),
          i => F.col("text").substr(i, F.lit(3)))).as("tri"))
      .groupBy("tri").agg(F.count(F.lit(1)).as("n"))
      .collect().map { r =>
        val t = r.getString(0)
        ((t.charAt(0).toInt << 16) | (t.charAt(1).toInt << 8) | t.charAt(2).toInt,
          r.getLong(1))
      }.toMap
    assert(packed === exploded)
    // short/empty strings yield the empty histogram, not junk windows
    val edge = spark.sql("SELECT a FROM VALUES (''), ('ab'), ('abc') t(a)")
      .select(graft.functions.TextFunctions.trigramCounts(F.col("a")).as("h"))
      .collect().map(_.getSeq[Long](0).length)
    assert(edge.toSeq == Seq(0, 0, 1))
  }

  test("fingerprint eligibility is byte-based: short-char multi-byte text keeps its windows") {
    import spark.implicits._
    // 6 chars / 12 UTF-8 bytes: has byte windows, must NOT be skipped;
    // 7 ASCII chars / 7 bytes: no window, sentinel sketch
    val df = Seq("éééééé", "abcdefg").toDF("text")
    val rows = df.select(
      F.octet_length(F.col("text")).as("ob"),
      graft.functions.TextFunctions.rollingMinHash(F.col("text"), 8, 2).getItem(0).as("fp"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(rows(12) != Long.MaxValue) // real sketch from byte windows
    assert(rows(7) == Long.MaxValue)  // no byte window -> sentinel
  }

  test("fingerprint is a pure function of text (one sketch per distinct text)") {
    val docs = graft.Tables(spark, SF, "documents")
    val eligible = docs.filter(F.octet_length(F.col("text")) >= 8).count()
    val fp = TextQueries.tFingerprint(spark, SF)
    assert(fp.count() == eligible)
    val perText = fp.join(docs.select("doc_id", "text"), "doc_id")
      .groupBy("text")
      .agg(F.countDistinct(F.struct("fp0", "fp1", "fp2", "fp3")).as("n"))
      .agg(F.max("n")).head().getLong(0)
    assert(perText == 1L)
  }

  test("near-identical docs share at least one fingerprint sketch value") {
    val near = DedupQueries.dJaccardPairs(spark, SF)
      .filter(F.col("jac") >= 0.95).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(near.nonEmpty)
    val fp = TextQueries.tFingerprint(spark, SF).collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val sharing = near.count { case (a, b) => (fp(a).toSet & fp(b).toSet).nonEmpty }
    assert(sharing.toDouble / near.length >= 0.6,
      s"only $sharing/${near.length} near-dup pairs share a sketch value")
  }

  test("one-pass rolling MinHash equals the explode formulation bit-for-bit") {
    // the corpus is pure ASCII, so 8-char windows == 8-byte windows
    val explodeForm = graft.Tables(spark, SF, "documents")
      .filter(F.length(F.col("text")) >= 8)
      .select(F.col("doc_id"), F.explode(F.expr(
        "transform(sequence(1, length(text)-7), i -> substring(text, i, 8))")).as("g"))
      .select(F.col("doc_id"), F.xxhash64(F.col("g")).as("h"))
      .groupBy("doc_id")
      .agg(F.min(F.xxhash64(F.lit(0), F.col("h"))).as("fp0"),
        F.min(F.xxhash64(F.lit(1), F.col("h"))).as("fp1"),
        F.min(F.xxhash64(F.lit(2), F.col("h"))).as("fp2"),
        F.min(F.xxhash64(F.lit(3), F.col("h"))).as("fp3"))
    val diff = TextQueries.tFingerprint(spark, SF)
      .join(explodeForm.withColumnsRenamed(
        (0 until 4).map(i => s"fp$i" -> s"e$i").toMap), "doc_id")
      .filter((0 until 4).map(i =>
        F.col(s"fp$i") =!= F.col(s"e$i")).reduce(_ || _))
      .count()
    assert(diff == 0)
  }

  test("one-pass trigram-LM scorer equals the explode+join formulation bit-for-bit") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat"), (2L, "the hat"), (3L, "cattle"), (4L, "xyz"))
      .toDF("doc_id", "text").filter(F.length(F.col("text")) >= 3)
    // explode formulation (the old plan): c3, c2, inner join, group by doc
    val tris = docs.select(F.col("doc_id"), F.explode(
      F.transform(F.sequence(F.lit(1), F.length(F.col("text")) - 2),
        i => F.col("text").substr(i, F.lit(3)))).as("tri"))
    val c3 = tris.groupBy("tri").agg(F.count(F.lit(1)).as("c3"))
    val c2 = tris.select(F.col("tri").substr(1, 2).as("bi"))
      .groupBy("bi").agg(F.count(F.lit(1)).as("c2"))
    val modelDf = c3.withColumn("bi", F.col("tri").substr(1, 2)).join(c2, "bi")
      .select(F.col("tri"), F.expr("(1000000 * c3) div c2").as("r6"))
    val expected = tris.join(modelDf, "tri").groupBy("doc_id")
      .agg(F.count(F.lit(1)).as("n"), F.sum("r6").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // one-pass expression over the collected model
    val model = modelDf.collect().map { r =>
      val t = r.getString(0)
      ((t.charAt(0).toInt << 16) | (t.charAt(1).toInt << 8) | t.charAt(2).toInt,
        r.getLong(1))
    }.toSeq
    val got = docs.select(F.col("doc_id"),
        graft.functions.TextFunctions.trigramLmScore(F.col("text"), model).as("sc"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1).head, r.getSeq[Long](1)(1))).toMap
    assert(got == expected)
    // a trigram absent from the model counts toward neither sum nor n
    val partial = docs.filter(F.col("doc_id") === 1L).select(
      graft.functions.TextFunctions.trigramLmScore(F.col("text"),
        model.take(2)).as("sc"))
      .collect()(0).getSeq[Long](0)
    assert(partial.head <= 2L)
  }

  test("one-pass ngram distinct+hits equals the array_distinct/intersect form") {
    import spark.implicits._
    // repeats (distinct matters), full-hit, no-hit, minimal 3-char, spaces
    val docs = Seq("ababababab", "the the the", "zzzzz", "abc", "a b c d e")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .filter(F.length(F.col("text")) >= 3)
    val qGrams = Seq("the", "ab ", "bab", "zzz")
    val grams = F.array_distinct(
      F.transform(F.sequence(F.lit(1), F.length(F.col("text")) - 2),
        i => F.col("text").substr(i, F.lit(3))))
    val expected = docs.select(F.col("doc_id"),
        F.size(grams).cast("long"), F.size(F.array_intersect(grams,
          F.typedlit(qGrams))).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val qKeys = qGrams.map(g =>
      (g.charAt(0).toInt << 16) | (g.charAt(1).toInt << 8) | g.charAt(2).toInt)
    val got = docs.select(F.col("doc_id"),
        graft.functions.TextFunctions.ngramJaccardHits(F.col("text"), qKeys).as("dh"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1).head, r.getSeq[Long](1)(1))).toMap
    assert(got == expected)
  }

  test("langid predictions come from the marker lexicon or 'und'") {
    val langs = TextQueries.tLangid(spark, SF)
      .select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    val allowed = TextQueries.markers.map(_._1).toSet + "und"
    assert(langs.subsetOf(allowed))
  }

  test("quality ratios are in [0,1]") {
    val bad = TextQueries.tQuality(spark, SF)
      .filter(F.col("stop_ratio") < 0 || F.col("stop_ratio") > 1 ||
        F.col("punct_ratio") < 0 || F.col("punct_ratio") > 1)
      .count()
    assert(bad == 0)
  }

  test("regex tokens at least match whitespace tokens on ascii word text") {
    val bad = TextQueries.tTokens(spark, SF)
      .filter(F.col("re_tokens") < F.col("ws_tokens")).count()
    assert(bad == 0)
  }

  test("media metadata matches its decode stub on a sample") {
    val row = MediaQueries.mMediaMeta(spark, SF)
      .filter(F.col("doc_id") === 0).head()
    val text = graft.Tables(spark, SF, "documents")
      .filter(F.col("doc_id") === 0).head().getAs[String]("text")
    val expect = MediaQueries.stubDecode(
      MediaQueries.MediaBlob(0L, text.getBytes("UTF-8")))
    assert(row.getAs[String]("fmt") == expect.fmt)
    assert(row.getAs[Int]("width") == expect.width)
    assert(row.getAs[Int]("height") == expect.height)
    assert(row.getAs[Long]("checksum") == expect.checksum)
  }
}
