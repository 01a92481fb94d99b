package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.Tables

/** Corpus-hygiene stages of a training-data pipeline: PII redaction and
  * benchmark decontamination. Both are single-shuffle shapes (one hash
  * aggregate / one semi-join on a shingle key) — at 100 TB the scrub is
  * embarrassingly parallel per document and decontamination's only
  * exchange is the candidate-shingle join, whose right side (the eval
  * set's shingles) is small enough to broadcast.
  */
object HygieneQueries {
  type Q = (SparkSession, String) => DataFrame

  private val emailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  private val phoneRe = """\b\d{3}-\d{4}\b"""

  /** t_pii_scrub: PII redaction — e-mail and phone patterns replaced by
    * typed placeholder tokens (the standard pre-training scrub). The test
    * corpus is word soup with no PII, so two-thirds of the docs get a
    * deterministic data-derived contact line injected (pure function of
    * doc_id — both engines synthesize the identical corpus); the rest
    * stay clean so the no-op path is exercised too. The regexes stick to
    * ASCII classes + \b\d — the portable intersection of Java regex and
    * RE2 semantics. Per-source audit stats: docs touched, characters
    * removed, and a min-string witness pinning the exact redacted text. */
  def tPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val aug = F.when(F.col("doc_id") % 3 === 0, F.col("text"))
      .otherwise(F.concat(
        F.substring(F.col("text"), 1, 60),
        F.lit(" contact user"), F.col("doc_id"), F.lit("@mail.example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"), F.lit(" today")))
    val scrub = F.regexp_replace(
      F.regexp_replace(F.col("aug"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("source"), aug.as("aug"))
      .withColumn("scrubbed", scrub)
      .groupBy("source")
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum(F.when(F.col("scrubbed") =!= F.col("aug"), 1L).otherwise(0L)).as("n_redacted"),
        F.sum((F.length(F.col("aug")) - F.length(F.col("scrubbed"))).cast("long")).as("chars_removed"),
        F.min("scrubbed").as("min_scrub"))
  }

  val tPiiScrubSql: String =
    """WITH a AS (
      |  SELECT doc_id, source,
      |   CASE WHEN doc_id % 3 = 0 THEN text
      |        ELSE substr(text, 1, 60) || ' contact user' || doc_id ||
      |             '@mail.example.com or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
      |   END AS aug
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, aug,
      |   regexp_replace(regexp_replace(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |     '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
      |  FROM a)
      |SELECT source, COUNT(*) AS n_docs,
      | CAST(SUM(CASE WHEN scrubbed <> aug THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
      | CAST(SUM(len(aug) - len(scrubbed)) AS BIGINT) AS chars_removed,
      | MIN(scrubbed) AS min_scrub
      |FROM r GROUP BY 1""".stripMargin

  /** d_decontam: benchmark decontamination — flag training documents that
    * share any 8-word-gram with the held-out eval set (`doc_id % 97 = 0`
    * plays the benchmark; the split is a pure function of the key, so
    * both engines carve the identical sets). The scale shape: per-doc
    * DISTINCT shingles once, the eval side's shingle set is tiny (eval
    * sets are thousands of docs, not billions) → broadcast semi-join;
    * contaminated ids dedup before the count. Per-source training-doc
    * counts, contaminated counts, and ppm. */
  def dDecontam(s: SparkSession, dir: String): DataFrame = {
    val ws = F.split(F.col("text"), " ")
    val sh = Tables(s, dir, "documents")
      .select(F.col("doc_id"), ws.as("w"))
      .filter(F.size(F.col("w")) >= 8)
      .select(F.col("doc_id"), F.explode(F.array_distinct(
        F.transform(F.sequence(F.lit(1), F.size(F.col("w")) - 7),
          i => F.concat_ws(" ", F.slice(F.col("w"), i, F.lit(8)))))).as("sh"))
      .localCheckpoint()
    val bench = sh.filter(F.col("doc_id") % 97 === 0).select("sh").distinct()
    val contam = sh.filter(F.col("doc_id") % 97 =!= 0)
      .join(F.broadcast(bench), "sh", "left_semi")
      .select("doc_id").distinct()
    Tables(s, dir, "documents").filter(F.col("doc_id") % 97 =!= 0)
      .join(contam.withColumn("hit", F.lit(1L)), Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(F.count(F.lit(1)).as("n_train"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0L))).as("n_contam"))
      .select(F.col("source"), F.col("n_train"), F.col("n_contam"),
        F.floor(F.col("n_contam").cast("double") / F.col("n_train").cast("double") * 1e6)
          .as("contam_ppm"))
  }

  val dDecontamSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |        WHERE len(string_split(text, ' ')) >= 8),
      |   UNNEST(range(1, len(w) - 6)) AS u(i)),
      |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
      |contam AS (
      |  SELECT DISTINCT doc_id FROM sh
      |  WHERE doc_id % 97 <> 0 AND sh IN (SELECT sh FROM bench))
      |SELECT d.source, COUNT(*) AS n_train,
      | CAST(COUNT(c.doc_id) AS BIGINT) AS n_contam,
      | CAST(floor(CAST(COUNT(c.doc_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e6) AS BIGINT) AS contam_ppm
      |FROM documents d LEFT JOIN contam c ON d.doc_id = c.doc_id
      |WHERE d.doc_id % 97 <> 0 GROUP BY 1""".stripMargin

  /** d_bloom_decontam: the decontamination check behind a BLOOM
    * PREFILTER — the 100 TB shape: the eval set's shingles compress into
    * one broadcastable bloom filter (bytes per thousand entries, not a
    * broadcast hash set), the train side keeps only shingles the filter
    * might contain, and the exact semi-join then runs on that small
    * candidate stream. Bloom filters have NO false negatives, so the
    * two-stage result provably equals the one-stage exact join — this
    * query shares d_decontam's oracle, making the prefilter's
    * result-invisibility part of the driver-checked contract (same
    * pattern as d_lsh_verified and q_salted). */
  def dBloomDecontam(s: SparkSession, dir: String): DataFrame = {
    val ws = F.split(F.col("text"), " ")
    val sh = Tables(s, dir, "documents")
      .select(F.col("doc_id"), ws.as("w"))
      .filter(F.size(F.col("w")) >= 8)
      .select(F.col("doc_id"), F.explode(F.array_distinct(
        F.transform(F.sequence(F.lit(1), F.size(F.col("w")) - 7),
          i => F.concat_ws(" ", F.slice(F.col("w"), i, F.lit(8)))))).as("sh"))
      .localCheckpoint()
    val bench = sh.filter(F.col("doc_id") % 97 === 0).select("sh").distinct()
      .localCheckpoint() // feeds the bloom build AND the exact verify
    // Spark's runtime-filter bloom aggregate, used directly (it has no
    // public SQL registration): built over xxhash64(shingle) longs
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val bloomAgg = GraftSqlBridge.column(new BloomFilterAggregate(
      GraftSqlBridge.expression(F.xxhash64(F.col("sh"))),
      GraftSqlBridge.expression(F.lit(100000L)),
      GraftSqlBridge.expression(F.lit(800000L))).toAggregateExpression())
    // might_contain requires a CONSTANT filter side: collect the ~100 KB
    // sketch and embed it (the runtime-filter framework would inject it
    // as a scalar subquery; at cluster scale this stays a driver-sized
    // object however large the corpus — that is the whole point)
    val bf = bloom_build(bench, bloomAgg)
    val mightContain = GraftSqlBridge.column(new BloomFilterMightContain(
      GraftSqlBridge.expression(F.lit(bf)),
      GraftSqlBridge.expression(F.xxhash64(F.col("sh")))))
    val cand = sh.filter(F.col("doc_id") % 97 =!= 0)
      .filter(mightContain)
      .select("doc_id", "sh")
    val contam = cand.join(F.broadcast(bench), "sh", "left_semi")
      .select("doc_id").distinct()
    Tables(s, dir, "documents").filter(F.col("doc_id") % 97 =!= 0)
      .join(contam.withColumn("hit", F.lit(1L)), Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(F.count(F.lit(1)).as("n_train"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0L))).as("n_contam"))
      .select(F.col("source"), F.col("n_train"), F.col("n_contam"),
        F.floor(F.col("n_contam").cast("double") / F.col("n_train").cast("double") * 1e6)
          .as("contam_ppm"))
  }

  private def bloom_build(bench: DataFrame,
                          agg: org.apache.spark.sql.Column): Array[Byte] =
    bench.agg(agg.as("bf")).head().getAs[Array[Byte]]("bf")

  /** d_gopher_rep: within-document repetition signals (the Gopher /
    * RefinedWeb quality-filter family): duplicate-word fraction
    * (1 − distinct/total) and the share of all bigrams taken by the most
    * frequent bigram. Pure per-document computation — a map-side explode +
    * two-level aggregate keyed on doc_id, no cross-document state at all,
    * so the op is embarrassingly parallel at any corpus size. Exact
    * integer counts; the two ratios are single divisions, floor-scaled to
    * ppm. */
  def dGopherRep(s: SparkSession, dir: String): DataFrame = {
    val ws = F.split(F.col("text"), " ")
    val base = Tables(s, dir, "documents")
      .select(F.col("doc_id"), ws.as("w"))
      .filter(F.size(F.col("w")) >= 2)
    val words = base.select(F.col("doc_id"), F.size(F.col("w")).cast("long").as("n_words"),
      F.size(F.array_distinct(F.col("w"))).cast("long").as("n_distinct"))
    val bigrams = base
      .select(F.col("doc_id"), F.explode(
        F.transform(F.sequence(F.lit(1), F.size(F.col("w")) - 1),
          i => F.concat_ws(" ", F.slice(F.col("w"), i, F.lit(2))))).as("bg"))
      .groupBy("doc_id", "bg").agg(F.count(F.lit(1)).as("c"))
      .groupBy("doc_id").agg(F.sum("c").as("n_bigrams"), F.max("c").as("top_bg"))
    words.join(bigrams, "doc_id")
      .select(F.col("doc_id"), F.col("n_words"),
        F.floor((F.col("n_words") - F.col("n_distinct")).cast("double") /
          F.col("n_words").cast("double") * 1e6).as("dup_word_ppm"),
        F.floor(F.col("top_bg").cast("double") /
          F.col("n_bigrams").cast("double") * 1e6).as("top_bigram_ppm"))
  }

  val dGopherRepSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |words AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
      |   CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
      |  FROM d),
      |bg AS (
      |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bg
      |  FROM d, UNNEST(range(1, len(w))) AS u(i)),
      |bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |bs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, CAST(MAX(c) AS BIGINT) AS top_bg
      |       FROM bc GROUP BY 1)
      |SELECT d.doc_id, words.n_words,
      | CAST(floor(CAST(words.n_words - words.n_distinct AS DOUBLE)
      |   / CAST(words.n_words AS DOUBLE) * 1e6) AS BIGINT) AS dup_word_ppm,
      | CAST(floor(CAST(bs.top_bg AS DOUBLE) / CAST(bs.n_bigrams AS DOUBLE) * 1e6) AS BIGINT) AS top_bigram_ppm
      |FROM d JOIN words ON d.doc_id = words.doc_id JOIN bs ON d.doc_id = bs.doc_id""".stripMargin

  /** d_substr_scrub: substring-level dedup — REMOVE (not just count)
    * every span covered by a word-8-gram that also appears in another
    * document, the ExactSubstr-style boilerplate scrub: headers, license
    * blocks and templated lines vanish while unique prose survives, and
    * (unlike document-level dedup) a doc that is 95% unique keeps its
    * unique 95%.
    *
    * Shape: 8-gram generation is per-row array code; ONE aggregate keyed
    * on the gram computes cross-doc frequency (map-side combine collapses
    * within-doc repeats); duplicated start positions flow back as ONE
    * per-doc array; the span-union and text rebuild are then map-only
    * higher-order functions (no second pass over grams). Grams ride as
    * strings so the oracle can build identical keys — at 100 TB they ride
    * as xxhash64 fingerprints (identical span structure, 8-byte keys). */
  def dSubstrScrub(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("text"), F.split(F.col("text"), " ").as("w"))
    val grams = docs
      .select(F.col("doc_id"), F.explode(F.expr(
        // sequence(1, 0) would DESCEND in Spark — guard the <8-word case
        "CASE WHEN size(w) >= 8 THEN transform(sequence(1, size(w) - 7), i -> struct(i AS i, array_join(slice(w, i, 8), ' ') AS g)) ELSE array() END"))
        .as("e"))
      .select(F.col("doc_id"), F.col("e.i").as("i"), F.col("e.g").as("g"))
    val dupGrams = grams.groupBy("g")
      .agg(F.countDistinct(F.col("doc_id")).as("df"))
      .filter(F.col("df") >= 2)
      .select("g")
    val starts = grams.join(dupGrams, "g")
      .groupBy("doc_id")
      .agg(F.sort_array(F.collect_list(F.col("i"))).as("starts"))
    docs.join(starts, Seq("doc_id"), "left")
      .withColumn("starts", F.coalesce(F.col("starts"), F.expr("array()")))
      .select(F.col("doc_id"),
        F.size(F.col("w")).cast("long").as("n_words"),
        F.expr("size(filter(sequence(1, size(w)), j -> exists(starts, s -> s <= j AND j < s + 8)))")
          .cast("long").as("n_removed"),
        F.expr("array_join(transform(filter(transform(sequence(1, size(w)), j -> struct(j AS j, element_at(w, j) AS word)), x -> NOT exists(starts, s -> s <= x.j AND x.j < s + 8)), x -> x.word), ' ')")
          .as("cleaned"))
  }

  val dSubstrScrubSql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |grams AS (
      |  SELECT doc_id, u.i AS i, array_to_string(w[u.i:u.i+7], ' ') AS g
      |  FROM docs, UNNEST(range(1, greatest(len(w) - 7, 0) + 1)) AS u(i)),
      |dup AS (
      |  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
      |starts AS (
      |  SELECT doc_id, list(i ORDER BY i) AS starts
      |  FROM grams JOIN dup USING (g) GROUP BY 1),
      |pos AS (
      |  SELECT d.doc_id, u.j AS j, d.w[u.j] AS word,
      |    len(list_filter(COALESCE(s.starts, []),
      |      x -> x <= u.j AND u.j < x + 8)) > 0 AS covered
      |  FROM docs d LEFT JOIN starts s USING (doc_id),
      |    UNNEST(range(1, len(d.w) + 1)) AS u(j))
      |SELECT doc_id, COUNT(*) AS n_words,
      |  CAST(COUNT(*) FILTER (WHERE covered) AS BIGINT) AS n_removed,
      |  COALESCE(string_agg(word, ' ' ORDER BY j) FILTER (WHERE NOT covered), '')
      |    AS cleaned
      |FROM pos GROUP BY 1""".stripMargin

  /** d_fuzzy_decontam: FUZZY benchmark decontamination — where d_decontam
    * flags only documents sharing a verbatim 8-gram with the eval set,
    * this flags partial-overlap contamination: per (train doc, eval doc),
    * the CONTAINMENT of the eval doc's 3-word shingle set in the train
    * doc, ov = |sh(train) ∩ sh(eval)| / |sh(eval)| (the direction that
    * matters for leakage: "how much of the benchmark is inside this
    * training doc"), flagged at ≥ 50%. Exact integer ppm — no sketch, no
    * float compare.
    *
    * Scale shape: the corpus-sized work is ONE posting-list equi-join of
    * train shingles against the BROADCAST eval shingle set (eval sets
    * are thousands of docs — bounded by contract, like the d_decontam
    * bench side), then a (train, eval)-keyed count whose cardinality is
    * bounded by |eval postings touched|, not n². Per-eval-doc summary
    * output (LEFT join) so clean eval docs surface as 0 rows matched —
    * the audit a release gate actually reads. */
  def dFuzzyDecontam(s: SparkSession, dir: String): DataFrame = {
    val sh = DedupQueries.wordShingles(Tables(s, dir, "documents"))
      .localCheckpoint() // feeds eval sizes, eval postings AND train side
    val ev = sh.filter(F.col("doc_id") % 97 === 0)
      .select(F.col("doc_id").as("eval_id"), F.col("s"))
    val evSizes = ev.groupBy("eval_id").agg(F.count(F.lit(1)).as("n_eval"))
    val pairs = sh.filter(F.col("doc_id") % 97 =!= 0)
      .select(F.col("doc_id").as("train_id"), F.col("s"))
      .join(F.broadcast(ev), "s")
      .groupBy("train_id", "eval_id").agg(F.count(F.lit(1)).as("c"))
      .join(F.broadcast(evSizes), "eval_id")
      .select(F.col("eval_id"), F.col("train_id"),
        F.expr("(1000000 * c) div n_eval").as("ov6"))
    evSizes.join(pairs.groupBy("eval_id")
        .agg(F.count(F.lit(1)).as("n_cand"), F.max("ov6").as("max_ov6"),
          F.sum(F.when(F.col("ov6") >= 500000L, 1L).otherwise(0L)).as("n_contam")),
        Seq("eval_id"), "left_outer")
      .select(F.col("eval_id"), F.col("n_eval"),
        F.coalesce(F.col("n_cand"), F.lit(0L)).as("n_cand"),
        F.coalesce(F.col("max_ov6"), F.lit(0L)).as("max_ov6"),
        F.coalesce(F.col("n_contam"), F.lit(0L)).as("n_contam"))
  }

  val dFuzzyDecontamSql: String =
    s"""WITH ${DedupQueries.shinglesSql},
       |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 97 = 0),
       |es AS (SELECT eval_id, COUNT(*) AS n_eval FROM ev GROUP BY 1),
       |pairs AS (
       |  SELECT ev.eval_id, t.doc_id AS train_id,
       |    (1000000 * COUNT(*)) // MAX(es.n_eval) AS ov6
       |  FROM sh t JOIN ev ON t.s = ev.s AND t.doc_id % 97 <> 0
       |  JOIN es ON es.eval_id = ev.eval_id
       |  GROUP BY 1, 2),
       |agg AS (
       |  SELECT eval_id, COUNT(*) AS n_cand, MAX(ov6) AS max_ov6,
       |    COUNT(*) FILTER (WHERE ov6 >= 500000) AS n_contam
       |  FROM pairs GROUP BY 1)
       |SELECT es.eval_id, es.n_eval,
       |  CAST(COALESCE(a.n_cand, 0) AS BIGINT) AS n_cand,
       |  CAST(COALESCE(a.max_ov6, 0) AS BIGINT) AS max_ov6,
       |  CAST(COALESCE(a.n_contam, 0) AS BIGINT) AS n_contam
       |FROM es LEFT JOIN agg a ON a.eval_id = es.eval_id""".stripMargin

  /** d_contam_frac: the per-document CONTAMINATION REPORT behind
    * d_decontam's boolean — for every training doc, what fraction of
    * its distinct 8-gram shingles also appears in the benchmark set
    * (doc_id % 97 == 0 plays the held-out benchmark, as in d_decontam).
    * The standard decontamination write-up reports exactly this ppm
    * distribution before choosing the drop threshold. Same plan shape
    * as d_decontam — one shingle explode, the benchmark side broadcast
    * — plus one per-doc aggregate; the division is one floor div of
    * exact counts. */
  def dContamFrac(s: SparkSession, dir: String): DataFrame = {
    val ws = F.split(F.col("text"), " ")
    val sh = Tables(s, dir, "documents")
      .select(F.col("doc_id"), ws.as("w"))
      .filter(F.size(F.col("w")) >= 8)
      .select(F.col("doc_id"), F.explode(F.array_distinct(
        F.transform(F.sequence(F.lit(1), F.size(F.col("w")) - 7),
          i => F.concat_ws(" ", F.slice(F.col("w"), i, F.lit(8)))))).as("sh"))
      .localCheckpoint()
    val bench = sh.filter(F.col("doc_id") % 97 === 0).select("sh").distinct()
    val train = sh.filter(F.col("doc_id") % 97 =!= 0)
    val hits = train.join(F.broadcast(bench), "sh", "left_semi")
      .groupBy("doc_id").agg(F.count(F.lit(1)).as("n_hit"))
    train.groupBy("doc_id").agg(F.count(F.lit(1)).as("n_sh"))
      .join(hits, Seq("doc_id"), "left_outer")
      .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0L)))
      .withColumn("hit_ppm", F.expr("(1000000 * n_hit) div n_sh"))
  }

  val dContamFracSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |        WHERE len(string_split(text, ' ')) >= 8),
      |   UNNEST(range(1, len(w) - 6)) AS u(i)),
      |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
      |train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
      |hits AS (
      |  SELECT doc_id, COUNT(*) AS n_hit FROM train
      |  WHERE sh IN (SELECT sh FROM bench) GROUP BY 1)
      |SELECT t.doc_id, COUNT(*) AS n_sh,
      | CAST(COALESCE(ANY_VALUE(h.n_hit), 0) AS BIGINT) AS n_hit,
      | CAST((1000000 * COALESCE(ANY_VALUE(h.n_hit), 0)) // COUNT(*) AS BIGINT) AS hit_ppm
      |FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
      |GROUP BY 1""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("d_contam_frac", dContamFrac _, Some(dContamFracSql)),
    ("d_fuzzy_decontam", dFuzzyDecontam _, Some(dFuzzyDecontamSql)),
    ("d_substr_scrub", dSubstrScrub _, Some(dSubstrScrubSql)),
    ("d_bloom_decontam", dBloomDecontam _, Some(dDecontamSql)),
    ("t_pii_scrub", tPiiScrub _, Some(tPiiScrubSql)),
    ("d_decontam", dDecontam _, Some(dDecontamSql)),
    ("d_gopher_rep", dGopherRep _, Some(dGopherRepSql)))
}
