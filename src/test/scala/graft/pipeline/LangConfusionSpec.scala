package graft.pipeline

import graft.SparkSpec

/** The language-ID confusion matrix must cover every document exactly
  * once and its shares must floor-sum to ≤ 1e6 per declared language. */
class LangConfusionSpec extends SparkSpec {

  test("t_lang_confusion covers the corpus and shares are per-lang ppm") {
    val rows = TextQueries.tLangConfusion(spark, SF).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.Tables(spark, SF, "documents").count()
    assert(rows.map(_._3).sum == nDocs, "every doc lands in exactly one cell")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val tot = cells.map(_._3).sum
      // floor-div shares: Σ ≤ 1e6 and within |cells| of it
      val s = cells.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - cells.length, s"$lang shares: $s")
      cells.foreach { c => assert(c._4 == 1000000L * c._3 / tot) }
    }
    // predictions come from the t_langid surface (including 'und')
    val preds = rows.map(_._2).toSet
    assert(preds.subsetOf(Set("en", "de", "es", "fr", "und")))
  }

  test("d_source_divergence matches a plain-Scala smoothed JS replica") {
    val rows = PipelineQueries.dSourceDivergence(spark, SF).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val docs = graft.Tables(spark, SF, "documents")
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val wc = docs.flatMap { case (s, t) => t.split(" ", -1).map(w => (s, w)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bySrc = wc.groupBy(_._1._1).view
      .mapValues(_.map { case ((_, w), c) => (w, c) }.toMap).toMap
    val vocab = wc.keys.map(_._2).toSet
    val v = vocab.size.toLong
    val srcs = bySrc.keys.toSeq.sorted
    assert(rows.size == srcs.size * (srcs.size - 1) / 2)
    for (i <- srcs.indices; j <- (i + 1) until srcs.size) {
      val (s1, s2) = (srcs(i), srcs(j))
      val n1 = bySrc(s1).values.sum; val n2 = bySrc(s2).values.sum
      val js9 = vocab.toSeq.map { w =>
        val p = (bySrc(s1).getOrElse(w, 0L) + 1).toDouble / (n1 + v)
        val q = (bySrc(s2).getOrElse(w, 0L) + 1).toDouble / (n2 + v)
        val m = (p + q) / 2.0
        math.floor((p * math.log(p / m) * 0.5 + q * math.log(q / m) * 0.5) * 1e9 + 0.5).toLong
      }.sum
      assert(rows((s1, s2)) == (n1, n2, v, js9), s"$s1/$s2")
      assert(js9 >= 0, "JS divergence is non-negative")
    }
    // the r9 sparse formulation only carries words PRESENT in a pair's
    // union (+ the closed-form absent constant); assert sparsity BITES
    // on this corpus, i.e. the dense pairs×vocab frame it replaced was
    // genuinely larger than the union-vocab frame
    val unionSum = (for (i <- srcs.indices; j <- (i + 1) until srcs.size)
      yield vocab.count(w => bySrc(srcs(i)).contains(w) ||
        bySrc(srcs(j)).contains(w)).toLong).sum
    assert(unionSum < srcs.size * (srcs.size - 1) / 2 * v,
      s"every word present in every pair union ($unionSum) — sparse tier moot")
  }

  test("t_heaps deciles tile the corpus and cumulative vocab is total vocab") {
    val rows = TextQueries.tHeaps(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 9L).toSeq)
    val docs = graft.Tables(spark, SF, "documents")
      .select("text").collect().map(_.getString(0))
    assert(rows.map(_._2).sum == docs.length)
    val totTokens = docs.map(_.split(" ", -1).length.toLong).sum
    assert(rows.map(_._3).sum == totTokens && rows.last._5 == totTokens)
    val vocab = docs.flatMap(_.split(" ", -1)).toSet.size.toLong
    assert(rows.last._6 == vocab)
    // cumulative columns are the running sums of the per-decile columns
    var ct = 0L; var cv = 0L
    rows.foreach { r => ct += r._3; cv += r._4; assert(r._5 == ct && r._6 == cv) }
  }
}
