package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

import graft.Tables

/** Text-analysis operators over `documents` (builder mandate, SURVEY §2D):
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * All per-document — embarrassingly parallel map-only plans with no
  * shuffle at any scale; every expression is a Catalyst built-in
  * (split/filter/translate/regexp), codegen'd, no UDFs. Doubles come from
  * single divisions of integers, so they are bit-identical to the oracle.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Marker lexicons per language (n-gram-heuristic langid). The corpus
    * vocabulary is English-ish, so the interesting part is the scoring
    * machinery; the oracle replicates it exactly. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "de" -> Seq("der", "die", "und", "nicht"),
    "es" -> Seq("el", "los", "una", "que"),
    "fr" -> Seq("le", "les", "une", "est"))

  private def inList(ws: Seq[String]): String = ws.map("'" + _ + "'").mkString(", ")

  /** t_langid: count marker-token occurrences per language; predict the
    * max-score language (priority order breaks ties), 'und' if no marker
    * hits. */
  def tLangid(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables(s, dir, "documents")
      .select(F.col("doc_id") +: markers.map { case (l, ws) =>
        F.expr(s"size(filter(split(text, ' '), x -> x IN (${inList(ws)})))")
          .cast("long").as(s"s_$l")
      }: _*)
    val best = markers.map { case (l, _) => F.col(s"s_$l") }.reduce((a, b) => F.greatest(a, b))
    scored.select(
      (F.col("doc_id") +: markers.map { case (l, _) => F.col(s"s_$l") }) :+
        F.when(best <= 0L, "und")
          .otherwise(markers.foldRight(F.lit("und"): Column) { case ((l, _), el) =>
            F.when(F.col(s"s_$l") === best, l).otherwise(el)
          }).as("pred_lang"): _*)
  }

  val tLangidSql: String = {
    val scores = markers.map { case (l, ws) =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(ws)}))) AS BIGINT) AS s_$l"
    }.mkString(",\n  ")
    val best = "greatest(" + markers.map { case (l, _) => s"s_$l" }.mkString(", ") + ")"
    val pick = markers.reverse.foldLeft("'und'") { case (el, (l, _)) =>
      s"CASE WHEN s_$l = $best THEN '$l' ELSE $el END"
    }
    s"""WITH scored AS (SELECT doc_id,
       |  $scores
       |FROM documents)
       |SELECT doc_id, ${markers.map { case (l, _) => s"s_$l" }.mkString(", ")},
       |  CASE WHEN $best <= 0 THEN 'und' ELSE $pick END AS pred_lang
       |FROM scored""".stripMargin
  }

  /** t_lang_confusion: the language-ID confusion matrix — declared
    * `lang` column vs t_langid's prediction, with each cell's share of
    * its declared-language row (ppm). The QA view a corpus curator reads
    * before trusting the classifier on a mixture: diagonal = recall per
    * language, off-diagonal = systematic confusions. One doc-id join of
    * two map-only frames + a (lang, pred) aggregate; the share window
    * partitions over ≤ |langs|² grouped rows. */
  def tLangConfusion(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    Tables(s, dir, "documents").select("doc_id", "lang")
      .join(tLangid(s, dir).select("doc_id", "pred_lang"), Seq("doc_id"))
      .groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).as("n"))
      .withColumn("tot", F.sum("n").over(w))
      .select(F.col("lang"), F.col("pred_lang"), F.col("n"),
        F.expr("(1000000 * n) div tot").as("share_ppm"))
  }

  val tLangConfusionSql: String =
    s"""WITH m AS (
       |  SELECT d.lang, p.pred_lang, COUNT(*) AS n
       |  FROM documents d JOIN ($tLangidSql) p ON d.doc_id = p.doc_id
       |  GROUP BY 1, 2)
       |SELECT lang, pred_lang, n,
       | CAST((1000000 * n) // SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS share_ppm
       |FROM m""".stripMargin

  /** t_heaps: the Heaps'-law vocabulary-growth curve — the corpus in ten
    * doc-id deciles: tokens ingested, NEW vocabulary introduced, and the
    * cumulative of both. New vocab per decile = words whose FIRST
    * occurrence (min doc_id over one explode) lands there, so the whole
    * curve costs one word-level aggregate — never a per-decile rescan —
    * and the cumulative walks ≤ 10 rows. The curator's diminishing-
    * returns read: a flattening curve says more of the same corpus buys
    * few new types (pairs with d_vocab_coverage's fixed-vocab view). */
  def tHeaps(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.split(F.col("text"), " ").as("ws"))
    val mx = docs.agg((F.max("doc_id") + 1).as("mx"))
    val withB = docs.crossJoin(F.broadcast(mx))
      .withColumn("bucket", F.expr("(doc_id * 10) div mx"))
    val perB = withB.groupBy("bucket")
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum(F.size(F.col("ws")).cast("long")).as("tokens"))
    val vocabNew = withB
      .select(F.col("bucket"), F.explode(F.col("ws")).as("w"))
      .groupBy("w").agg(F.min("bucket").as("bucket"))
      .groupBy("bucket").agg(F.count(F.lit(1)).as("new_vocab"))
    val cw = Window.partitionBy(F.pmod(F.col("bucket"), F.lit(1)))
      .orderBy(F.col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // LEFT join: a decile can introduce NO new types (a tiny vocabulary
    // saturates in decile 0) and must still appear with new_vocab = 0
    perB.join(vocabNew, Seq("bucket"), "left")
      .withColumn("new_vocab", F.coalesce(F.col("new_vocab"), F.lit(0L)))
      .withColumn("cum_tokens", F.sum("tokens").over(cw))
      .withColumn("cum_vocab", F.sum("new_vocab").over(cw))
  }

  val tHeapsSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |mx AS (SELECT MAX(doc_id) + 1 AS mx FROM d),
      |b AS (SELECT doc_id, ws, (doc_id * 10) // mx AS bucket FROM d, mx),
      |pb AS (
      |  SELECT bucket, COUNT(*) AS n_docs, CAST(SUM(len(ws)) AS BIGINT) AS tokens
      |  FROM b GROUP BY 1),
      |vn AS (
      |  SELECT bucket, COUNT(*) AS new_vocab FROM (
      |    SELECT w, MIN(bucket) AS bucket
      |    FROM (SELECT bucket, UNNEST(ws) AS w FROM b) x GROUP BY 1) f
      |  GROUP BY 1)
      |SELECT pb.bucket, pb.n_docs, pb.tokens,
      | CAST(COALESCE(vn.new_vocab, 0) AS BIGINT) AS new_vocab,
      | CAST(SUM(pb.tokens) OVER (ORDER BY pb.bucket ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
      | CAST(SUM(COALESCE(vn.new_vocab, 0)) OVER (ORDER BY pb.bucket ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
      |FROM pb LEFT JOIN vn ON pb.bucket = vn.bucket""".stripMargin

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** t_quality: length/punct/stopword-ratio quality score. Ratios are
    * single divisions (bit-identical); score is a fixed-order double
    * expression. */
  def tQuality(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(F.col("doc_id"),
        F.expr("size(split(text, ' '))").cast("long").as("n_words"),
        F.length(F.col("text")).cast("long").as("n_chars"),
        (F.length(F.col("text")) - F.length(F.translate(F.col("text"), ".,!?;:", "")))
          .cast("long").as("n_punct"),
        F.expr(s"size(filter(split(text, ' '), x -> x IN (${inList(stopwords)})))")
          .cast("long").as("n_stop"))
      .select(F.col("doc_id"), F.col("n_words"), F.col("n_chars"), F.col("n_punct"),
        F.col("n_stop"),
        (F.col("n_stop").cast("double") / F.col("n_words").cast("double")).as("stop_ratio"),
        (F.col("n_punct").cast("double") / F.col("n_chars").cast("double")).as("punct_ratio"))

  val tQualitySql: String =
    s"""WITH m AS (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(length(text) - length(translate(text, '.,!?;:', '')) AS BIGINT) AS n_punct,
       |  CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(stopwords)}))) AS BIGINT) AS n_stop
       |FROM documents)
       |SELECT doc_id, n_words, n_chars, n_punct, n_stop,
       |  CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio,
       |  CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio
       |FROM m""".stripMargin

  /** BPE-ish tokenizer regex: letter runs, digit runs, single symbols. */
  val tokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** t_tokens: whitespace token count + regex token count per doc. */
  def tTokens(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(F.col("doc_id"),
        F.expr("size(split(text, ' '))").cast("long").as("ws_tokens"),
        F.expr(s"regexp_count(text, '$tokenRe')").cast("long").as("re_tokens"))

  val tTokensSql: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(text, '$tokenRe')) AS BIGINT) AS re_tokens
       |FROM documents""".stripMargin

  /** t_fingerprint: 4-value MinHash sketch over rolling 8-byte windows
    * (rows-only: xxhash64 values are engine-specific; TextSpec asserts
    * the semantic properties AND value-equality with the explode
    * formulation). One codegen'd pass per document via the RollingMinHash
    * expression — the explode form ships a row per window (|doc| rows per
    * doc) through a shuffle; this emits 4 longs per doc, map-only.
    * Windows are BYTE windows (see rollingMinHash's API doc), so the
    * has-a-window guard is octet_length, not character length — the two
    * differ on non-ASCII text. */
  def tFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .filter(F.octet_length(F.col("text")) >= 8)
      .select(F.col("doc_id") +: (0 until 4).map(i =>
        graft.functions.TextFunctions.rollingMinHash(F.col("text"), 8, 4)
          .getItem(i).as(s"fp$i")): _*)

  /** t_fingerprint driver entry (ORACLE-BACKED since r10, r9 verdict
    * #2): the one-pass RollingMinHash expression must equal the explode
    * formulation BIT-FOR-BIT per document — 8-byte window substrings →
    * xxhash64 → four seeded re-hash minima — with the per-doc window
    * count (octet_length − 7; the corpus is ASCII so DuckDB's strlen
    * agrees) riding the oracle hash for EVERY doc. The explode twin
    * itself runs on the md5-least-256 doc slice only (r10 verdict #7:
    * it was the one fold whose verification side — O(total corpus
    * bytes) through a shuffle — was asymptotically heavier than its
    * map-only production side); unsampled docs carry ok = 1 from the
    * totality contract alone, sampled docs only if the reconstruction
    * matches bit-for-bit. The sample is engine-shared but the oracle
    * needs no sample subquery: ok = 1 everywhere either way. */
  def tFingerprintChecked(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val samp = AnnQueries.md5LeastN(docs, "doc_id", AnnQueries.GateSampleN)
      .withColumnRenamed("doc_id", "sid")
    val ex = docs
      .join(F.broadcast(samp), F.col("doc_id") === F.col("sid"), "left_semi")
      .filter(F.octet_length(F.col("text")) >= 8)
      .select(F.col("doc_id"),
        F.explode(F.expr(
          "transform(sequence(1, length(text)-7), i -> substring(text, i, 8))"))
          .as("g"))
      .select(F.col("doc_id"), F.xxhash64(F.col("g")).as("h"))
      .groupBy("doc_id")
      .agg(F.min(F.xxhash64(F.lit(0), F.col("h"))).as("e0"),
        F.min(F.xxhash64(F.lit(1), F.col("h"))).as("e1"),
        F.min(F.xxhash64(F.lit(2), F.col("h"))).as("e2"),
        F.min(F.xxhash64(F.lit(3), F.col("h"))).as("e3"))
    val nWin = docs.filter(F.octet_length(F.col("text")) >= 8)
      .select(F.col("doc_id"),
        (F.octet_length(F.col("text")) - 7).cast("long").as("n_win"))
    tFingerprint(s, dir).join(nWin, "doc_id")
      .join(F.broadcast(ex), Seq("doc_id"), "left")
      .select(F.col("doc_id"), F.col("n_win"),
        F.when(F.col("e0").isNull ||
          (F.col("fp0") === F.col("e0") && F.col("fp1") === F.col("e1") &&
           F.col("fp2") === F.col("e2") && F.col("fp3") === F.col("e3")), 1L)
          .otherwise(0L).as("ok"))
  }

  val tFingerprintCheckedSql: String =
    """SELECT doc_id, CAST(strlen(text) - 7 AS BIGINT) AS n_win,
      | CAST(1 AS BIGINT) AS ok
      |FROM documents WHERE strlen(text) >= 8""".stripMargin

  /** t_fingerprint_gate: the rolling-MinHash document fingerprint under
    * the HASH GATE — the sketch values themselves have no SQL oracle,
    * but the operator's CONTRACT does: every byte-eligible doc
    * (octet_length ≥ 8) gets exactly one row, and the fingerprint is a
    * pure function of text (identical texts ⇒ identical 4-sketch
    * tuples). ok = 1 iff no text maps to two distinct tuples; the
    * eligible-doc count rides the oracle hash. */
  def tFingerprintGate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val fp = tFingerprint(s, dir)
    val perText = fp.join(docs.select("doc_id", "text"), "doc_id")
      .groupBy("text")
      .agg(F.countDistinct(F.struct("fp0", "fp1", "fp2", "fp3")).as("nd"))
      .agg(F.max("nd").as("max_nd"))
    fp.agg(F.count(F.lit(1)).as("n_docs"))
      .crossJoin(F.broadcast(perText))
      .select(F.col("n_docs"),
        F.when(F.col("max_nd") === 1L, 1L).otherwise(0L).as("ok"))
  }

  val tFingerprintGateSql: String =
    """SELECT COUNT(*) AS n_docs, CAST(1 AS BIGINT) AS ok
      |FROM documents WHERE strlen(text) >= 8""".stripMargin

  /** t_zipf: Zipf rank-frequency fit — the corpus-health diagnostic
    * (natural corpora have log-log slope ≈ −1; pathological/boilerplate
    * corpora drift): OLS slope of ln(freq) vs ln(rank) over the top-100
    * terms. The cut is a TakeOrdered (never a global sort); the rank
    * then comes from ONE sort_array + posexplode over the bounded
    * 100-struct array — no single-partition window anywhere. Each ln is
    * rounded to an integer ×10⁶ per term BEFORE the moment sums
    * (q_entropy discipline), the sums ride DECIMAL(38,0), and the slope
    * is one terminal division of exact integers cast to double — the
    * identical IEEE tree on both engines. */
  def tZipf(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables(s, dir, "documents")
      .select(F.explode(F.split(F.col("text"), " ")).as("term"))
      .groupBy("term").agg(F.count(F.lit(1)).as("n"))
    val top = counts.orderBy(F.col("n").desc, F.col("term").asc).limit(100)
    val pts = top
      .agg(F.sort_array(F.collect_list(
        F.struct((-F.col("n")).as("negn"), F.col("term"), F.col("n")))).as("a"))
      .select(F.posexplode(F.col("a")).as(Seq("pos", "s")))
      .select(
        F.floor(F.log((F.col("pos") + 1).cast("double")) * 1e6 + 0.5).cast("long").as("x6"),
        F.floor(F.log(F.col("s.n").cast("double")) * 1e6 + 0.5).cast("long").as("y6"))
    pts
      .agg(F.count(F.lit(1)).as("k"),
        F.sum("x6").cast("decimal(38,0)").as("sx"),
        F.sum("y6").cast("decimal(38,0)").as("sy"),
        F.sum(F.expr("cast(x6 as decimal(38,0)) * y6")).cast("decimal(38,0)").as("sxy"),
        F.sum(F.expr("cast(x6 as decimal(38,0)) * x6")).cast("decimal(38,0)").as("sxx"))
      .select(F.col("k"),
        F.expr("cast(k * sxy - sx * sy as double) / cast(k * sxx - sx * sx as double)")
          .as("slope"))
  }

  val tZipfSql: String =
    """WITH counts AS (
      |  SELECT term, COUNT(*) AS n
      |  FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
      |  GROUP BY 1),
      |top AS (SELECT term, n FROM counts ORDER BY n DESC, term ASC LIMIT 100),
      |pts AS (
      |  SELECT
      |   CAST(floor(ln(ROW_NUMBER() OVER (ORDER BY n DESC, term ASC)) * 1e6 + 0.5) AS BIGINT) AS x6,
      |   CAST(floor(ln(n) * 1e6 + 0.5) AS BIGINT) AS y6
      |  FROM top),
      |m AS (
      |  SELECT COUNT(*) AS k,
      |   CAST(SUM(x6) AS HUGEINT) AS sx, CAST(SUM(y6) AS HUGEINT) AS sy,
      |   CAST(SUM(CAST(x6 AS HUGEINT) * y6) AS HUGEINT) AS sxy,
      |   CAST(SUM(CAST(x6 AS HUGEINT) * x6) AS HUGEINT) AS sxx
      |  FROM pts)
      |SELECT k,
      | CAST(k * sxy - sx * sy AS DOUBLE) / CAST(k * sxx - sx * sx AS DOUBLE) AS slope
      |FROM m""".stripMargin

  /** t_topterms: top-5 terms per source by frequency (explode → count →
    * per-group top-N window; ties broken alphabetically). The groupBy
    * pre-aggregates map-side, so the shuffle carries (source, term)
    * partial counts, not raw tokens. */
  def tTopTerms(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables(s, dir, "documents")
      .select(F.col("source"), F.explode(F.split(F.col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(F.count(F.lit(1)).as("n"))
    counts
      .withColumn("rnk", F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(F.col("n").desc, F.col("term").asc)))
      .filter(F.col("rnk") <= 5)
  }

  val tTopTermsSql: String =
    """WITH counts AS (
      |  SELECT source, term, COUNT(*) AS n
      |  FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
      |  GROUP BY 1, 2)
      |SELECT source, term, n, rnk FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, term ASC) AS rnk
      |  FROM counts)
      |WHERE rnk <= 5""".stripMargin

  /** t_clean: text normalization — strip punctuation, collapse runs of
    * spaces, trim. The cleaning stage every training pipeline runs before
    * tokenization; map-only, regex stays inside codegen, and the oracle
    * replicates it exactly (DuckDB needs the 'g' flag Spark implies). */
  def tClean(s: SparkSession, dir: String): DataFrame = {
    val cleaned = F.trim(F.regexp_replace(
      F.regexp_replace(F.col("text"), "[.,!?;:]", ""), " +", " "))
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), cleaned.as("clean"),
        (F.length(F.col("text")) - F.length(cleaned)).cast("long").as("n_removed"))
  }

  val tCleanSql: String =
    """SELECT doc_id,
      | trim(regexp_replace(regexp_replace(text, '[.,!?;:]', '', 'g'), ' +', ' ', 'g')) AS clean,
      | CAST(length(text) -
      |   length(trim(regexp_replace(regexp_replace(text, '[.,!?;:]', '', 'g'), ' +', ' ', 'g')))
      |   AS BIGINT) AS n_removed
      |FROM documents""".stripMargin

  /** t_trigram_lm: statistical fluency scoring by a character-trigram
    * model trained on the corpus itself (the CCNet/KenLM shape:
    * score each document by how predictable its character stream is
    * under corpus statistics; low scores flag boilerplate/garble).
    *
    * Twist that makes it cross-engine exact: the per-position
    * "probability" is the integer ratio floor(1e6·c(tri)/c(bi)) and the
    * doc score its integer mean — ALL arithmetic is BIGINT (no doubles,
    * no logs, so no libm divergence between engines; the ranking it
    * induces is the same as mean trigram continuation probability).
    * Shape: ONE explode+count pass trains c(tri) (map-side partial, the
    * only corpus-sized shuffle); c(bi) then aggregates from the DISTINCT-
    * trigram table (charset³-bounded) rather than re-scanning the corpus;
    * the model collects to the driver and scoring is a single map-only
    * pass (TrigramLmScore, the model riding as reference arrays) — no
    * per-trigram rows ever reach a join or a doc_id shuffle.
    * ASCII corpus: character and byte offsets coincide on both engines. */
  /** Train the integer trigram model on `docs`' text column: trigram →
    * r6 = floor(1e6·c3/c2). One explode+count pass over the training
    * stream; c2 aggregates from the charset³-bounded distinct-trigram
    * table; the model collects to the driver (bounded) for map-only
    * scoring via TrigramLmScore. Shared by t_trigram_lm (corpus model)
    * and d_dsir (corpus + target-domain models). */
  /** Train the corpus model AND a flagged-subset model from ONE trigram
    * explode+aggregate (d_dsir needs both; training them separately scans
    * and explodes the corpus twice). Conditional counts: c3t/c2t are the
    * subset's trigram/bigram counts, so the subset model is bit-identical
    * to training on the filtered corpus — trigrams absent from the subset
    * simply don't appear in its model. */
  /** Driver-side model bound: keep only the TopK most frequent trigrams
    * (ties → lexical order) — CCNet-style frequency pruning that makes
    * the collect CORPUS-INDEPENDENT (O(TopK)) instead of charset³, the
    * r8 verdict's open-vocabulary fix. Probabilities (c3/c2, c3t/c2t)
    * are computed over the FULL counts first; pruning only shrinks the
    * model's support, and an absent trigram is simply unscored (the
    * codegen'd scorer's inner-join semantics, mirrored by the oracles'
    * join through the `kept` CTE). 256 < this corpus's 377 distinct
    * trigrams, so the rule BITES at every SF and stays oracle-pinned;
    * a production run would raise it to taste (the bound is the knob). */
  val TrigramModelTopK = 256

  // Both model builders count through TextFunctions.trigramCounts — the
  // per-DOC histogram expression — so the explode ships one packed long
  // per distinct per-doc trigram instead of one UTF8String row per
  // character position (r10 verdict #5: the position-explode was the
  // super-linear term — 15.4× time for 13.3× text — through allocation
  // and shuffle-row pressure; the histogram is the same map-side
  // partial-aggregation discipline as q_topk_heap, one level earlier).
  // Keys are the scorer's own 24-bit byte triples: for this ASCII corpus
  // packed-int order ≡ lexical order, so `ORDER BY c3 DESC, k` is the
  // oracle's `ORDER BY c3 DESC, tri` exactly (TextSpec asserts the
  // packed path ≡ the explode path end-to-end).

  private[pipeline] def trigramModels2(docs: DataFrame,
      flag: Column): (Seq[(Int, Long)], Seq[(Int, Long)]) = {
    val c3 = docs
      .select(flag.as("f"), F.explode(
        graft.functions.TextFunctions.trigramCounts(F.col("text"))).as("pk"))
      .select(F.col("f"), F.expr("pk >> 32").cast("int").as("k"),
        F.expr("pk & 4294967295").as("c"))
      .groupBy("k").agg(F.sum("c").as("c3"),
        F.sum(F.when(F.col("f"), F.col("c")).otherwise(0L)).as("c3t"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bi")
    val rows = c3.withColumn("bi", F.expr("k >> 8"))
      .withColumn("c2", F.sum("c3").over(w))
      .withColumn("c2t", F.sum("c3t").over(w))
      .select(F.col("k"), F.col("c3"),
        F.expr("(1000000 * c3) div c2").as("r6"),
        F.expr("CASE WHEN c3t > 0 THEN (1000000 * c3t) div c2t END").as("r6t"))
      // bounded-heap top-K (TakeOrderedAndProject): the ONLY driver
      // collect is the pruned model, at any vocabulary size
      .orderBy(F.col("c3").desc, F.col("k")).limit(TrigramModelTopK)
      .drop("c3")
      .collect()
    val corpus = rows.map(r => (r.getInt(0), r.getLong(1))).toSeq
    val target = rows.filter(!_.isNullAt(2))
      .map(r => (r.getInt(0), r.getLong(2))).toSeq
    (corpus, target)
  }

  private[pipeline] def trigramModel(docs: DataFrame,
      topK: Int = TrigramModelTopK): Seq[(Int, Long)] = {
    val c3 = docs
      .select(F.explode(
        graft.functions.TextFunctions.trigramCounts(F.col("text"))).as("pk"))
      .select(F.expr("pk >> 32").cast("int").as("k"),
        F.expr("pk & 4294967295").as("c"))
      .groupBy("k").agg(F.sum("c").as("c3"))
    c3.withColumn("bi", F.expr("k >> 8"))
      .withColumn("c2", F.sum("c3").over(
        org.apache.spark.sql.expressions.Window.partitionBy("bi")))
      .select(F.col("k"), F.col("c3"), F.expr("(1000000 * c3) div c2").as("r6"))
      // corpus-independent driver bound (see TrigramModelTopK)
      .orderBy(F.col("c3").desc, F.col("k")).limit(topK)
      .select("k", "r6")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
  }

  def tTrigramLm(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents").filter(F.length(F.col("text")) >= 3)
    val model = trigramModel(docs)
    docs
      .select(F.col("doc_id"),
        graft.functions.TextFunctions.trigramLmScore(F.col("text"), model).as("sc"))
      .select(F.col("doc_id"),
        F.element_at(F.col("sc"), 1).as("n_tris"),
        F.expr("element_at(sc, 2) div element_at(sc, 1)").as("score6"))
      // a doc whose every trigram was PRUNED from the top-K model is
      // unscorable — drop it, matching the oracle's inner join through
      // the `kept` CTE (without this, Spark would emit n_tris=0 with a
      // NULL div-by-zero score while the SQL emits no row; impossible
      // on this corpus — min kept-hits is 40 — but the contract must
      // not depend on that)
      .filter(F.col("n_tris") > 0)
  }

  val tTrigramLmSql: String =
    s"""WITH tris AS (
      |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 3) AS tri
      |  FROM documents, UNNEST(range(1, length(text) - 1)) AS u(i)
      |  WHERE length(text) >= 3),
      |c3 AS (SELECT tri, COUNT(*) AS c3 FROM tris GROUP BY 1),
      |kept AS (SELECT tri, c3 FROM c3
      |  QUALIFY ROW_NUMBER() OVER (ORDER BY c3 DESC, tri) <= $TrigramModelTopK),
      |c2 AS (SELECT substr(tri, 1, 2) AS bi, COUNT(*) AS c2 FROM tris GROUP BY 1)
      |SELECT doc_id, COUNT(*) AS n_tris,
      | CAST(SUM((1000000 * kept.c3) // c2.c2) // COUNT(*) AS BIGINT) AS score6
      |FROM tris
      |JOIN kept USING (tri)
      |JOIN c2 ON c2.bi = substr(tris.tri, 1, 2)
      |GROUP BY 1""".stripMargin

  /** t_url_parse: the ClickHouse URL-function family (domain / path /
    * extractURLParameter) through Spark's codegen'd `parse_url`. URLs are
    * synthesized deterministically from doc fields (the corpus has none),
    * then parsed back; the oracle reconstructs each component from the
    * same fields directly, so a hash match proves the parser inverts the
    * construction — host, path, and two query parameters, per doc. */
  def tUrlParse(s: SparkSession, dir: String): DataFrame = {
    val url = F.concat(F.lit("https://www."), F.col("source"),
      F.lit(".example.com/docs/"), F.col("doc_id"),
      F.lit("?lang="), F.col("lang"), F.lit("&v="), F.col("doc_id") % 7)
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), url.as("url"))
      .select(F.col("doc_id"),
        F.parse_url(F.col("url"), F.lit("HOST")).as("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).as("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).as("p_lang"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("v")).as("p_v"))
  }

  val tUrlParseSql: String =
    """SELECT doc_id,
      | 'www.' || source || '.example.com' AS host,
      | '/docs/' || doc_id AS path,
      | lang AS p_lang,
      | CAST(doc_id % 7 AS VARCHAR) AS p_v
      |FROM documents""".stripMargin

  /** t_ngram_search: ClickHouse `ngramDistance`-style fuzzy match — rank
    * documents by character-trigram Jaccard similarity against a query
    * phrase. Both set sizes come from per-row higher-order functions
    * (array_distinct / array_intersect against the constant query set) —
    * the whole scoring is MAP-ONLY inside codegen; the only exchange in
    * the plan is the top-20 TakeOrderedAndProject. No per-gram rows, no
    * doc_id shuffle, no pairwise doc×doc work. Exact integer set sizes;
    * the similarity is one division floor-scaled to ppm; top-20 by
    * (sim DESC, doc_id ASC) total order. */
  def tNgramSearch(s: SparkSession, dir: String): DataFrame = {
    val query = "the fast key order sort table"
    val qGrams = query.sliding(3).toSeq.distinct
    val qKeys = qGrams.map(g =>
      (g.charAt(0).toInt << 16) | (g.charAt(1).toInt << 8) | g.charAt(2).toInt)
    val hits = Tables(s, dir, "documents")
      .filter(F.length(F.col("text")) >= 3)
      .select(F.col("doc_id"),
        graft.functions.TextFunctions.ngramJaccardHits(F.col("text"), qKeys).as("dh"))
      .select(F.col("doc_id"),
        F.element_at(F.col("dh"), 1).as("n_grams"),
        F.element_at(F.col("dh"), 2).as("n_hit"))
    hits
      .select(F.col("doc_id"), F.col("n_grams"), F.col("n_hit"),
        F.floor(F.col("n_hit").cast("double") /
          (F.col("n_grams") + F.lit(qGrams.size.toLong) - F.col("n_hit")).cast("double") * 1e6)
          .as("sim_ppm"))
      .orderBy(F.col("sim_ppm").desc, F.col("doc_id").asc)
      .limit(20)
  }

  val tNgramSearchSql: String = {
    val query = "the fast key order sort table"
    val qGrams = query.sliding(3).toSeq.distinct
    val inList = qGrams.map(g => s"'${g.replace("'", "''")}'").mkString(", ")
    s"""WITH dg AS (
       |  SELECT DISTINCT doc_id, substr(text, i, 3) AS g
       |  FROM documents, UNNEST(range(1, len(text) - 1)) AS u(i)
       |  WHERE len(text) >= 3),
       |h AS (
       |  SELECT doc_id, COUNT(*) AS n_grams,
       |   CAST(SUM(CASE WHEN g IN ($inList) THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
       |  FROM dg GROUP BY 1)
       |SELECT doc_id, n_grams, n_hit,
       | CAST(floor(CAST(n_hit AS DOUBLE)
       |   / CAST(n_grams + ${qGrams.size} - n_hit AS DOUBLE) * 1e6) AS BIGINT) AS sim_ppm
       |FROM h ORDER BY sim_ppm DESC, doc_id ASC LIMIT 20""".stripMargin
  }

  /** t_ip_funcs: the ClickHouse IPv4 function family
    * (IPv4NumToString / IPv4StringToNum / CIDR grouping / range test) —
    * per-user addresses are deterministically synthesized in 10/8
    * (render), parsed BACK from the string (the parse is the operator
    * under test — a split + positional fold, same as the URL family),
    * grouped by /16 subnet with an in-10.0.0.0/9 flag, top-20 subnets.
    * All integer/string ops, cross-engine exact. */
  def tIpFuncs(s: SparkSession, dir: String): DataFrame = {
    val ipCol = F.concat_ws(".",
      F.lit(10), F.expr("(uid*7+1) % 256"), F.expr("(uid*13+5) % 256"),
      F.expr("(uid*31+7) % 256"))
    val ips = Tables(s, dir, "events").select(F.col("user_id").as("uid"))
      .distinct().select(F.col("uid"), ipCol.as("ip"))
    val o: Int => Column = i => F.element_at(F.split(F.col("ip"), "\\."), i).cast("long")
    val parsed = ips.select(F.col("uid"), F.col("ip"),
      (o(1) * 16777216L + o(2) * 65536L + o(3) * 256L + o(4)).as("num"),
      F.concat_ws(".", o(1), o(2), F.lit("0.0/16")).as("subnet"))
    val grouped = parsed.groupBy("subnet")
      .agg(F.count(F.lit(1)).as("n"), F.min("num").as("lo"), F.max("num").as("hi"),
        F.sum(F.when(F.col("num") < 10L * 16777216L + 8388608L, 1L).otherwise(0L))
          .as("n_in_lower_half"))
    // Top-20 via orderBy+limit → TakeOrderedAndProject (a per-partition
    // bounded heap + driver merge), never a single-partition global window.
    grouped
      .orderBy(F.col("n").desc, F.col("subnet").asc)
      .limit(20)
      .select("subnet", "n", "lo", "hi", "n_in_lower_half")
  }

  val tIpFuncsSql: String =
    """WITH ips AS (
      |  SELECT uid, '10.' || ((uid*7+1) % 256) || '.' || ((uid*13+5) % 256)
      |           || '.' || ((uid*31+7) % 256) AS ip
      |  FROM (SELECT DISTINCT user_id AS uid FROM events)),
      |parsed AS (
      |  SELECT uid, ip,
      |    CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
      |      + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
      |      + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
      |      + CAST(string_split(ip, '.')[4] AS BIGINT) AS num,
      |    string_split(ip, '.')[1] || '.' || string_split(ip, '.')[2] || '.0.0/16' AS subnet
      |  FROM ips),
      |grouped AS (
      |  SELECT subnet, COUNT(*) AS n,
      |    CAST(MIN(num) AS BIGINT) AS lo, CAST(MAX(num) AS BIGINT) AS hi,
      |    CAST(SUM(CASE WHEN num < 10*16777216 + 8388608 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_in_lower_half
      |  FROM parsed GROUP BY 1)
      |SELECT subnet, n, lo, hi, n_in_lower_half FROM grouped
      |ORDER BY n DESC, subnet ASC LIMIT 20""".stripMargin

  /** Needle set for t_multisearch (fixed, like ClickHouse's constant
    * needle arrays). */
  val Needles: Seq[String] = Seq("the", "data", "model", "graph", "query")

  /** t_multisearch: ClickHouse `multiSearchAny`/`hasToken` — one map-only
    * pass computing, per document, the bitmask and count of which
    * constant needles occur (substring semantics). N needles = N
    * codegen'd instr calls fused in one projection, not N passes. */
  def tMultiSearch(s: SparkSession, dir: String): DataFrame = {
    val hitBits = Needles.zipWithIndex.map { case (w, i) =>
      F.when(F.instr(F.col("text"), w) > 0, F.lit(1L << i)).otherwise(F.lit(0L))
    }.reduce(_ + _)
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), hitBits.as("hits"))
      .select(F.col("doc_id"), F.col("hits"),
        F.expr("bit_count(hits)").cast("long").as("n_hit"))
  }

  val tMultiSearchSql: String = {
    val bits = Needles.zipWithIndex.map { case (w, i) =>
      s"CASE WHEN strpos(text, '$w') > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    s"""SELECT doc_id, CAST($bits AS BIGINT) AS hits,
       |  CAST(bit_count(CAST($bits AS BIGINT)) AS BIGINT) AS n_hit
       |FROM documents""".stripMargin
  }

  /** t_codec: the encoding function family (ClickHouse base64Encode /
    * hex / unhex; Spark base64 / hex / unbase64) — per doc, the base64
    * and hex renderings' lengths plus a decode-roundtrip proof: the md5
    * of unbase64(base64(text)) must equal the md5 of the original (the
    * hash equality makes the roundtrip part of the DRIVER-checked
    * contract, not just a spec). Map-only, one pass. */
  def tCodec(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(F.col("doc_id"),
        // Spark's base64 MIME-chunks at 76 chars (RFC 2045 \r\n breaks);
        // strip them to the canonical unchunked RFC 4648 length
        F.length(F.regexp_replace(F.base64(F.col("text").cast("binary")),
          "[\\r\\n]", "")).cast("long").as("b64_len"),
        F.length(F.hex(F.col("text").cast("binary"))).cast("long").as("hex_len"),
        (F.md5(F.unbase64(F.base64(F.col("text").cast("binary"))))
          === F.md5(F.col("text").cast("binary"))).cast("long").as("roundtrip_ok"),
        F.substring(F.hex(F.col("text").cast("binary")), 1, 16).as("hex16"))

  // DuckDB hex() is uppercase like Spark's; base64 is to_base64(BLOB);
  // DuckDB md5 wants VARCHAR, so the decoded BLOB is cast back.
  val tCodecSql: String =
    """SELECT doc_id,
      |  CAST(length(to_base64(CAST(text AS BLOB))) AS BIGINT) AS b64_len,
      |  CAST(length(hex(text)) AS BIGINT) AS hex_len,
      |  CAST(md5(CAST(from_base64(to_base64(CAST(text AS BLOB))) AS VARCHAR)) = md5(text)
      |    AS BIGINT) AS roundtrip_ok,
      |  substring(hex(text), 1, 16) AS hex16
      |FROM documents""".stripMargin

  /** t_string_suite: the ClickHouse string-function family (position,
    * substring, reverse, leftPad, replaceAll, splitByChar) as one
    * map-only pass per document — every expression a codegen'd Catalyst
    * built-in with an exact DuckDB equivalent (1-based positions, 0 when
    * absent; ASCII corpus so byte/char semantics coincide). */
  def tStringSuite(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(F.col("doc_id"),
        F.instr(F.col("text"), "the").cast("long").as("pos_the"),
        F.substring(F.col("text"), 5, 12).as("sub"),
        F.reverse(F.substring(F.col("text"), 1, 8)).as("rev8"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").as("pad"),
        F.length(F.regexp_replace(F.col("text"), "the", "THEE")).cast("long").as("len_repl"),
        (F.size(F.split(F.col("text"), "e", -1)) - 1).cast("long").as("n_e"))

  val tStringSuiteSql: String =
    """SELECT doc_id,
      | CAST(strpos(text, 'the') AS BIGINT) AS pos_the,
      | substr(text, 5, 12) AS sub,
      | reverse(substr(text, 1, 8)) AS rev8,
      | lpad(CAST(doc_id AS VARCHAR), 8, '0') AS pad,
      | CAST(length(regexp_replace(text, 'the', 'THEE', 'g')) AS BIGINT) AS len_repl,
      | CAST(len(string_split(text, 'e')) - 1 AS BIGINT) AS n_e
      |FROM documents""".stripMargin

  /** The fuzzy-match lexicon for t_editdist (one marker per language
    * family plus near-collisions, so distances are discriminative). */
  val editLexicon: Seq[String] =
    Seq("the", "der", "los", "les", "une", "fast", "nicht", "que")

  /** t_editdist: ClickHouse `editDistance` — fuzzy lexicon matching.
    * Per document: the Levenshtein distance from the document's first
    * word to each canonical marker, folded into (best distance, best
    * term) with first-in-lexicon tie-break — classic unit-cost DP on
    * both engines, exact integers; plus the punctuation-distance of the
    * 16-char prefix against its cleaned form. Map-only, no shuffle. */
  def tEditDist(s: SparkSession, dir: String): DataFrame = {
    val w1 = F.element_at(F.split(F.col("text"), " "), 1)
    val cleaned = F.substring(
      F.trim(F.regexp_replace(F.regexp_replace(F.col("text"), "[.,!?;:]", ""), " +", " ")), 1, 16)
    val base = Tables(s, dir, "documents")
      .select(F.col("doc_id"), w1.as("w"),
        F.levenshtein(F.substring(F.col("text"), 1, 16), cleaned)
          .cast("long").as("d_clean"))
    val folded = editLexicon.tail.foldLeft(
      (F.levenshtein(F.col("w"), F.lit(editLexicon.head)).cast("long"),
        F.lit(editLexicon.head))) { case ((bd, bt), cand) =>
      val d = F.levenshtein(F.col("w"), F.lit(cand)).cast("long")
      (F.when(d < bd, d).otherwise(bd), F.when(d < bd, cand).otherwise(bt))
    }
    base.select(F.col("doc_id"), F.col("d_clean"),
      folded._1.as("best_d"), folded._2.as("best_term"))
  }

  val tEditDistSql: String = {
    val h = editLexicon.head
    val (bdExpr, btExpr) = editLexicon.tail.foldLeft(
      (s"CAST(levenshtein(w, '$h') AS BIGINT)", s"'$h'")) { case ((bd, bt), cand) =>
      val d = s"CAST(levenshtein(w, '$cand') AS BIGINT)"
      (s"CASE WHEN $d < $bd THEN $d ELSE $bd END",
        s"CASE WHEN $d < $bd THEN '$cand' ELSE $bt END")
    }
    s"""WITH b AS (
       |  SELECT doc_id, string_split(text, ' ')[1] AS w,
       |   CAST(levenshtein(substr(text, 1, 16),
       |     substr(trim(regexp_replace(regexp_replace(text, '[.,!?;:]', '', 'g'), ' +', ' ', 'g')), 1, 16)) AS BIGINT) AS d_clean
       |  FROM documents)
       |SELECT doc_id, d_clean, $bdExpr AS best_d, $btExpr AS best_term
       |FROM b""".stripMargin
  }

  /** t_phonetic: ClickHouse `soundex` — phonetic bucketing of each
    * document's first word (fuzzy name/term matching: words that sound
    * alike share a code). Spark's codegen'd `soundex` built-in does the
    * per-row work (map-only); one hash aggregate groups the corpus into
    * phonetic buckets. The oracle replicates American Soundex exactly
    * for all-letter input: letter→digit map, h/w invisible to the
    * adjacent-dedup rule (consonants separated by h/w collapse), vowels
    * break the dedup chain, first letter kept verbatim, pad to 4.
    * Input is restricted to `^[a-z]+$` first words on BOTH engines so
    * the non-letter edge cases (where implementations diverge) are out
    * of domain. Scale: map + one bounded aggregate (≤ 26·7³ buckets). */
  def tPhonetic(s: SparkSession, dir: String): DataFrame = {
    val w = F.element_at(F.split(F.col("text"), " "), 1)
    Tables(s, dir, "documents")
      .select(w.as("w"))
      .filter(F.col("w").rlike("^[a-z]+$"))
      .select(F.soundex(F.col("w")).as("sndx"), F.col("w"))
      .groupBy("sndx")
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.countDistinct(F.col("w")).as("n_w"),
        F.min(F.col("w")).as("min_w"),
        F.max(F.col("w")).as("max_w"))
  }

  val tPhoneticSql: String =
    """WITH words AS (
      |  SELECT doc_id, string_split(text, ' ')[1] AS w FROM documents
      |  WHERE regexp_matches(string_split(text, ' ')[1], '^[a-z]+$')),
      |chars AS (
      |  SELECT doc_id, w, u.i AS pos, substr(w, u.i, 1) AS ch
      |  FROM words, UNNEST(range(1, len(w) + 1)) AS u(i)),
      |coded AS (
      |  SELECT doc_id, w, pos,
      |    CASE WHEN ch IN ('b','f','p','v') THEN '1'
      |         WHEN ch IN ('c','g','j','k','q','s','x','z') THEN '2'
      |         WHEN ch IN ('d','t') THEN '3'
      |         WHEN ch = 'l' THEN '4'
      |         WHEN ch IN ('m','n') THEN '5'
      |         WHEN ch = 'r' THEN '6'
      |         WHEN ch IN ('h','w') THEN '7'
      |         ELSE '0' END AS code
      |  FROM chars),
      |-- h/w never update the last-emitted code (pos 1 always does)
      |sel AS (SELECT * FROM coded WHERE pos = 1 OR code <> '7'),
      |lagd AS (
      |  SELECT *, lag(code) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |  FROM sel),
      |emitted AS (
      |  SELECT doc_id, pos, code,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS k
      |  FROM lagd WHERE pos > 1 AND code <> '0' AND code <> prev),
      |sndxs AS (
      |  SELECT wo.doc_id, wo.w,
      |    upper(substr(wo.w, 1, 1)) ||
      |      rpad(coalesce(string_agg(e.code, '' ORDER BY e.pos)
      |        FILTER (WHERE e.k <= 3), ''), 3, '0') AS sndx
      |  FROM words wo LEFT JOIN emitted e ON wo.doc_id = e.doc_id
      |  GROUP BY 1, 2)
      |SELECT sndx, COUNT(*) AS n_docs, COUNT(DISTINCT w) AS n_w,
      |  min(w) AS min_w, max(w) AS max_w
      |FROM sndxs GROUP BY 1""".stripMargin

  /** t_stem: suffix-stripping stemming (the normalization step before
    * dedup/search indexing) — every corpus word collapsed to its stem
    * bucket. Map-only expression work + ONE vocabulary-bounded hash
    * aggregate. */
  def tStem(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(F.explode(F.split(F.col("text"), " ")).as("word"))
      .filter(F.col("word").rlike("^[a-z]+$"))
      .withColumn("s1", F.expr(stemRule1))
      .withColumn("s2", F.expr(stemRule2))
      .withColumn("stem", F.expr(stemRule3))
      .groupBy("stem")
      .agg(F.count(F.lit(1)).as("n_occ"),
        F.countDistinct(F.col("word")).as("n_w"),
        F.min(F.col("word")).as("min_w"),
        F.max(F.col("word")).as("max_w"))

  /** Rule stages shared verbatim with the oracle SQL. */
  private val stemRule1 =
    """CASE WHEN right(word, 4) = 'sses' THEN left(word, length(word) - 2)
      |     WHEN right(word, 3) = 'ies' THEN left(word, length(word) - 2)
      |     WHEN right(word, 2) = 'ss' THEN word
      |     WHEN right(word, 1) = 's' AND length(word) > 3 THEN left(word, length(word) - 1)
      |     ELSE word END""".stripMargin
  private val stemRule2 =
    """CASE WHEN right(s1, 3) = 'ing' AND length(s1) > 5 THEN left(s1, length(s1) - 3)
      |     WHEN right(s1, 2) = 'ed' AND length(s1) > 4 THEN left(s1, length(s1) - 2)
      |     ELSE s1 END""".stripMargin
  private val stemRule3 =
    """CASE WHEN right(s2, 2) = 'ly' AND length(s2) > 4 THEN left(s2, length(s2) - 2)
      |     ELSE s2 END""".stripMargin

  val tStemSql: String =
    s"""WITH w AS (
       |  SELECT u.word AS word FROM documents,
       |    UNNEST(string_split(text, ' ')) AS u(word)
       |  WHERE regexp_matches(u.word, '^[a-z]+$$')),
       |r1 AS (SELECT word, $stemRule1 AS s1 FROM w),
       |r2 AS (SELECT word, $stemRule2 AS s2 FROM r1),
       |r3 AS (SELECT word, $stemRule3 AS stem FROM r2)
       |SELECT stem, COUNT(*) AS n_occ, COUNT(DISTINCT word) AS n_w,
       |  min(word) AS min_w, max(word) AS max_w
       |FROM r3 GROUP BY 1""".stripMargin

  /** t_char_entropy: per-document character-level Shannon entropy +
    * distinct-char count — the compressibility proxy quality signal
    * (low-entropy docs are boilerplate/repetitive; the cheap stand-in for
    * a zlib-ratio gate in Gopher/Dolma-style filters). Whole thing is
    * MAP-ONLY: per-char counts over the fixed [a-z ] charset via the
    * length-minus-replace trick (27 codegen'd string ops per row — no
    * explode, no shuffle at all before the output), entropy assembled
    * from per-term BIGINT-rounded c·log2(c) (q_entropy's 1-ulp
    * discipline, order-independent over the fixed charset). The SAME
    * Scala loop renders the expression into both engine dialects (the
    * q_geo trick), so the formulations agree by construction. */
  def tCharEntropy(s: SparkSession, dir: String): DataFrame = {
    val chars = ('a' to 'z').map(_.toString) :+ " "
    def cnt(ch: String) = s"(length(text) - length(replace(text, '$ch', '')))"
    val n = chars.map(cnt).mkString(" + ")
    def term(ch: String) =
      s"""(CASE WHEN ${cnt(ch)} > 0 THEN cast(floor(
         |  cast(${cnt(ch)} as double) * log2(cast(${cnt(ch)} as double))
         |  * 1e6 + 0.5) as bigint) ELSE 0 END)""".stripMargin
    val slg = chars.map(term).mkString(" + ")
    val kd = chars.map(ch => s"(CASE WHEN ${cnt(ch)} > 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    Tables(s, dir, "documents")
      .select(F.col("doc_id"),
        F.expr(s"cast($n as bigint)").as("n"),
        F.expr(s"cast($kd as bigint)").as("k_distinct"),
        F.expr(s"cast($slg as bigint)").as("slg6"))
      .filter(F.col("n") > 0)
      .select(F.col("doc_id"), F.col("n"), F.col("k_distinct"),
        F.expr("cast(floor((log2(cast(n as double)) - (cast(slg6 as double) / 1e6) / cast(n as double)) * 1e6 + 0.5) as bigint)").as("h6"))
  }

  val tCharEntropySql: String = {
    val chars = ('a' to 'z').map(_.toString) :+ " "
    def cnt(ch: String) = s"(length(text) - length(replace(text, '$ch', '')))"
    val n = chars.map(cnt).mkString(" + ")
    def term(ch: String) =
      s"""(CASE WHEN ${cnt(ch)} > 0 THEN CAST(floor(
         |  CAST(${cnt(ch)} AS DOUBLE) * log2(CAST(${cnt(ch)} AS DOUBLE))
         |  * 1e6 + 0.5) AS BIGINT) ELSE 0 END)""".stripMargin
    val slg = chars.map(term).mkString(" + ")
    val kd = chars.map(ch => s"(CASE WHEN ${cnt(ch)} > 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""SELECT doc_id, n, k_distinct,
       |  CAST(floor((log2(CAST(n AS DOUBLE)) - (CAST(slg6 AS DOUBLE) / 1e6) / CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS h6
       |FROM (
       |  SELECT doc_id, CAST($n AS BIGINT) AS n,
       |    CAST($kd AS BIGINT) AS k_distinct,
       |    CAST($slg AS BIGINT) AS slg6
       |  FROM documents) x
       |WHERE n > 0""".stripMargin
  }

  /** t_kn_lm: interpolated Kneser-Ney bigram LM fluency scoring — the
    * stronger form of the CCNet-style perplexity filter (t_trigram_lm is
    * the add-one-smoothed baseline; KN's continuation counts are the
    * standard production smoothing, Kneser & Ney 1995). With discount
    * d = 3/4:  P(w|v) = max(c(vw)−d, 0)/c(v) + d·N1+(v·)/c(v) · N1+(·w)/B.
    * Everything stays integer: scaling by 4·c(v)·B gives the exact
    * numerator S = (4·c(vw)−3)·B + 3·N1+(v·)·N1+(·w), and each scored
    * bigram emits score6 = (1e6·S) div (4·c(v)·B) — one exact floor
    * division per bigram, order-independent, so both engines agree bit
    * for bit (no logs, no doubles anywhere). The numerator product rides
    * DECIMAL(38,0) / HUGEINT — BIGINT would overflow past ~sf3. Model
    * tables (bigram counts, left/right continuation counts) are one
    * aggregate each over the map-only generated adjacent-pair stream; the
    * scoring join is the only other exchange. Output: per-doc bigram
    * count + mean KN score (exact integer div). */
  def tKnLm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val toks = Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.split(F.col("text"), " ").as("ws"))
    val bg = toks.select(F.col("doc_id"), F.explode(F.expr(
      """transform(slice(ws, 1, size(ws) - 1), (w, i) ->
        |  struct(w AS v, element_at(ws, i + 2) AS w2))""".stripMargin)).as("p"))
      .select(F.col("doc_id"), F.col("p.v").as("v"), F.col("p.w2").as("w"))
    val cvw = bg.groupBy("v", "w").agg(F.count(F.lit(1)).as("c_vw"))
    // c(v), N1+(v·) from the bigram-type table; N1+(·w) likewise; B = |types|
    val left = cvw.groupBy("v").agg(F.sum("c_vw").as("c_v"),
      F.count(F.lit(1)).as("n1l"))
    val right = cvw.groupBy("w").agg(F.count(F.lit(1)).as("n1r"))
    val btypes = cvw.agg(F.count(F.lit(1)).as("bb"))
    val model = cvw
      .join(left, Seq("v")).join(right, Seq("w"))
      .crossJoin(F.broadcast(btypes))
      .select(F.col("v"), F.col("w"),
        F.expr("""cast((cast(1000000 as decimal(38,0)) *
            ((4 * c_vw - 3) * cast(bb as decimal(38,0)) + 3 * n1l * n1r))
            div (4 * c_v * cast(bb as decimal(38,0))) as bigint)""").as("score6"))
    bg.join(model, Seq("v", "w"))
      .groupBy("doc_id")
      .agg(F.count(F.lit(1)).as("nbg"), F.sum("score6").as("ssum"))
      .select(F.col("doc_id"), F.col("nbg"),
        F.expr("ssum div nbg").as("kn6"))
  }

  val tKnLmSql: String =
    """WITH toks AS MATERIALIZED (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |pos AS MATERIALIZED (
      |  SELECT doc_id, UNNEST(ws) AS w, generate_subscripts(ws, 1) AS i FROM toks),
      |bg AS MATERIALIZED (
      |  SELECT p1.doc_id, p1.w AS v, p2.w AS w
      |  FROM pos p1 JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.i = p1.i + 1),
      |cvw AS MATERIALIZED (SELECT v, w, COUNT(*) AS c_vw FROM bg GROUP BY 1, 2),
      |lft AS MATERIALIZED (
      |  SELECT v, SUM(c_vw) AS c_v, COUNT(*) AS n1l FROM cvw GROUP BY 1),
      |rgt AS MATERIALIZED (SELECT w, COUNT(*) AS n1r FROM cvw GROUP BY 1),
      |bt AS (SELECT COUNT(*) AS bb FROM cvw),
      |model AS MATERIALIZED (
      |  SELECT cvw.v, cvw.w,
      |    CAST((1000000 * ((4 * c_vw - 3) * bb + 3 * n1l * n1r))
      |      // (4 * c_v * bb) AS BIGINT) AS score6
      |  FROM cvw JOIN lft ON lft.v = cvw.v JOIN rgt ON rgt.w = cvw.w CROSS JOIN bt)
      |SELECT bg.doc_id, COUNT(*) AS nbg,
      |  CAST(SUM(score6) // COUNT(*) AS BIGINT) AS kn6
      |FROM bg JOIN model ON model.v = bg.v AND model.w = bg.w
      |GROUP BY bg.doc_id""".stripMargin

  /** t_cooc: skip-gram co-occurrence + PMI (the word2vec/GloVe
    * count-matrix substrate — what embedding training preps from a
    * corpus): unordered word pairs within distance ≤ 3, min support 5,
    * ranked by pointwise mutual information. Pair generation is MAP-ONLY
    * — one codegen'd nested transform+slice per document (each token
    * pairs with its next 3 — O(len·3) per doc, no positional self-join,
    * no doc_id shuffle); the only exchanges are the pair/unigram count
    * aggregates. PMI = log2(c_ab·T/(c_a·c_b)) assembled from FOUR
    * per-quantity BIGINT-rounded log2 terms (q_entropy's 1-ulp
    * discipline — the sum of pre-rounded integers is order-independent
    * and cross-engine-exact); the corpus total T stays engine-side (one
    * aggregated row cross-joined, never a driver constant). Top-20 under
    * the (pmi6 DESC, wa, wb) total order via TakeOrdered. The oracle
    * generates pairs by positional self-join — an independent
    * formulation of the same window. */
  def tCooc(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.split(F.col("text"), " ").as("ws"))
    val pairs = toks.select(F.explode(F.expr(
      """flatten(transform(ws, (w, i) ->
        |  transform(slice(ws, i + 2, 3), w2 ->
        |    struct(least(w, w2) AS a, greatest(w, w2) AS b))))""".stripMargin)).as("p"))
      .select(F.col("p.a").as("wa"), F.col("p.b").as("wb"))
    val cPair = pairs.groupBy("wa", "wb").agg(F.count(F.lit(1)).as("c_ab"))
    val uni = toks.select(F.explode(F.col("ws")).as("w"))
      .groupBy("w").agg(F.count(F.lit(1)).as("c_w"))
    val tot = pairs.agg(F.count(F.lit(1)).as("t"))
    def lg(c: Column): Column =
      F.floor(F.log2(c.cast("double")) * 1e6 + 0.5).cast("long")
    cPair.filter(F.col("c_ab") >= 5)
      .join(uni.select(F.col("w").as("wa"), F.col("c_w").as("c_a")), Seq("wa"))
      .join(uni.select(F.col("w").as("wb"), F.col("c_w").as("c_b")), Seq("wb"))
      .crossJoin(F.broadcast(tot))
      .select(F.col("wa"), F.col("wb"), F.col("c_ab"), F.col("c_a"), F.col("c_b"),
        (lg(F.col("c_ab")) + lg(F.col("t")) - lg(F.col("c_a")) - lg(F.col("c_b")))
          .as("pmi6"))
      .orderBy(F.col("pmi6").desc, F.col("wa").asc, F.col("wb").asc)
      .limit(20)
  }

  val tCoocSql: String =
    """WITH toks AS MATERIALIZED (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |pos AS MATERIALIZED (
      |  SELECT doc_id, UNNEST(ws) AS w, generate_subscripts(ws, 1) AS i FROM toks),
      |pr AS MATERIALIZED (
      |  SELECT least(p1.w, p2.w) AS wa, greatest(p1.w, p2.w) AS wb
      |  FROM pos p1 JOIN pos p2 ON p2.doc_id = p1.doc_id
      |    AND p2.i BETWEEN p1.i + 1 AND p1.i + 3),
      |cp AS MATERIALIZED (SELECT wa, wb, COUNT(*) AS c_ab FROM pr GROUP BY 1, 2),
      |uni AS MATERIALIZED (SELECT w, COUNT(*) AS c_w FROM pos GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS t FROM pr)
      |SELECT wa, wb, c_ab, ca.c_w AS c_a, cb.c_w AS c_b,
      |  CAST(floor(log2(CAST(c_ab AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |  + CAST(floor(log2(CAST(tot.t AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |  - CAST(floor(log2(CAST(ca.c_w AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |  - CAST(floor(log2(CAST(cb.c_w AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS pmi6
      |FROM cp JOIN uni ca ON ca.w = cp.wa JOIN uni cb ON cb.w = cp.wb CROSS JOIN tot
      |WHERE c_ab >= 5
      |ORDER BY pmi6 DESC, wa, wb LIMIT 20""".stripMargin

  /** t_code_frac: code-vs-prose detection by symbol statistics — the
    * cheap gate a Stack/Dolma-style pipeline runs before routing
    * documents to code vs text processing: per doc, ppm rates of code
    * indicator characters ({}();=<>[]), digits, and ALL-CAPS words, plus
    * the resulting is_code flag (indicator ppm over a threshold);
    * summarized per source. Pure map-only length-difference counting
    * (the t_char_entropy discipline) + one bounded rollup. */
  def tCodeFrac(s: SparkSession, dir: String): DataFrame = {
    val n = F.length(F.col("text"))
    def rate(re: String) =
      F.expr(s"(1000000 * (length(text) - length(regexp_replace(text, '$re', '')))) div greatest(length(text), 1)")
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("source"), n.cast("long").as("n_chars"),
        rate("[{}();=<>\\\\[\\\\]]").as("code_ppm"),
        rate("[0-9]").as("digit_ppm"),
        F.expr("(1000000 * size(filter(split(text, ' '), x -> x = upper(x) AND x <> lower(x)))) div greatest(size(split(text, ' ')), 1)")
          .as("caps_ppm"))
      .withColumn("is_code", (F.col("code_ppm") > 20000L).cast("long"))
      .groupBy("source")
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum("is_code").as("n_code"),
        F.expr("sum(code_ppm) div count(1)").as("mean_code_ppm"),
        F.expr("sum(digit_ppm) div count(1)").as("mean_digit_ppm"),
        F.expr("sum(caps_ppm) div count(1)").as("mean_caps_ppm"))
  }

  val tCodeFracSql: String =
    """WITH per AS (
      |  SELECT doc_id, source,
      |   (1000000 * (length(text) - length(regexp_replace(text, '[{}();=<>\[\]]', '', 'g'))))
      |     // greatest(length(text), 1) AS code_ppm,
      |   (1000000 * (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))))
      |     // greatest(length(text), 1) AS digit_ppm,
      |   (1000000 * len(list_filter(string_split(text, ' '),
      |      x -> x = upper(x) AND x <> lower(x))))
      |     // greatest(len(string_split(text, ' ')), 1) AS caps_ppm
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      | CAST(SUM(CASE WHEN code_ppm > 20000 THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
      | CAST(SUM(code_ppm) // COUNT(*) AS BIGINT) AS mean_code_ppm,
      | CAST(SUM(digit_ppm) // COUNT(*) AS BIGINT) AS mean_digit_ppm,
      | CAST(SUM(caps_ppm) // COUNT(*) AS BIGINT) AS mean_caps_ppm
      |FROM per GROUP BY 1""".stripMargin

  /** t_ttr: per-document TYPE-TOKEN RATIO (distinct words / words, as
    * integer ppm) — the lexical-diversity quality signal next to
    * t_quality's ratios (low TTR flags repetitive/templated text before
    * any n-gram pass). One map + per-doc distinct count, exact ints. */
  def tTtr(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.split(F.col("text"), " ").as("w"))
      .select(F.col("doc_id"), F.size(F.col("w")).cast("long").as("n_tokens"),
        F.size(F.array_distinct(F.col("w"))).cast("long").as("n_types"))
      .withColumn("ttr_ppm", F.expr("(1000000 * n_types) div n_tokens"))

  val tTtrSql: String =
    """SELECT doc_id,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
      | CAST((1000000 * len(list_distinct(string_split(text, ' ')))) // len(string_split(text, ' ')) AS BIGINT) AS ttr_ppm
      |FROM documents""".stripMargin

  /** t_hapax: hapax legomena share per source — the fraction (ppm) of
    * a source's vocabulary occurring exactly once (corpus linguistics'
    * quick vocabulary-richness/OCR-noise screen: natural text ≈ 40-60%,
    * templated text far less, noisy text far more). One word-count
    * aggregate per (source, word) + one source rollup. */
  def tHapax(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(F.col("source"), F.explode(F.split(F.col("text"), " ")).as("word"))
      .groupBy("source", "word").agg(F.count(F.lit(1)).as("c"))
      .groupBy("source")
      .agg(F.count(F.lit(1)).as("n_vocab"),
        F.sum(F.when(F.col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_ppm", F.expr("(1000000 * n_hapax) div n_vocab"))

  val tHapaxSql: String =
    """WITH wc AS (
      |  SELECT source, u.word AS word, COUNT(*) AS c
      |  FROM documents, UNNEST(string_split(text, ' ')) AS u(word)
      |  GROUP BY 1, 2)
      |SELECT source, COUNT(*) AS n_vocab,
      | CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      | CAST((1000000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS hapax_ppm
      |FROM wc GROUP BY 1""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("t_hapax", tHapax _, Some(tHapaxSql)),
    ("t_ttr", tTtr _, Some(tTtrSql)),
    ("t_code_frac", tCodeFrac _, Some(tCodeFracSql)),
    ("t_char_entropy", tCharEntropy _, Some(tCharEntropySql)),
    ("t_kn_lm", tKnLm _, Some(tKnLmSql)),
    ("t_cooc", tCooc _, Some(tCoocSql)),
    ("t_stem", tStem _, Some(tStemSql)),
    ("t_phonetic", tPhonetic _, Some(tPhoneticSql)),
    ("t_editdist", tEditDist _, Some(tEditDistSql)),
    ("t_zipf", tZipf _, Some(tZipfSql)),
    ("t_string_suite", tStringSuite _, Some(tStringSuiteSql)),
    ("t_codec", tCodec _, Some(tCodecSql)),
    ("t_ip_funcs", tIpFuncs _, Some(tIpFuncsSql)),
    ("t_multisearch", tMultiSearch _, Some(tMultiSearchSql)),
    ("t_ngram_search", tNgramSearch _, Some(tNgramSearchSql)),
    ("t_url_parse", tUrlParse _, Some(tUrlParseSql)),
    ("t_trigram_lm", tTrigramLm _, Some(tTrigramLmSql)),
    ("t_clean", tClean _, Some(tCleanSql)),
    ("t_langid", tLangid _, Some(tLangidSql)),
    ("t_lang_confusion", tLangConfusion _, Some(tLangConfusionSql)),
    ("t_heaps", tHeaps _, Some(tHeapsSql)),
    ("t_quality", tQuality _, Some(tQualitySql)),
    ("t_tokens", tTokens _, Some(tTokensSql)),
    ("t_fingerprint", tFingerprintChecked _, Some(tFingerprintCheckedSql)),
    ("t_fingerprint_gate", tFingerprintGate _, Some(tFingerprintGateSql)),
    ("t_topterms", tTopTerms _, Some(tTopTermsSql)))
}
