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
}
