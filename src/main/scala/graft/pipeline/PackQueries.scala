package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.Tables

/** Input row for the packing fold (public: private case classes break
  * Spark's codegen'd encoders). */
case class PackDoc(doc_id: Long, source: String, h: String, n: Long)

/** One packed placement: document `doc_id` sits in bin `bin` of its
  * source's stream at token offset `off`. */
case class PackSlot(doc_id: Long, source: String, bin: Long, off: Long, n: Long)

/** Training-sequence assembly operators (builder mandate, SURVEY §2D):
  * the stages between a filtered corpus and a token stream — sequence
  * packing, term weighting, readability scoring.
  */
object PackQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Context-window capacity (whitespace tokens) for d_pack. Docs average
    * ~54 tokens, so bins hold ~4-5 docs — enough occupancy to exercise
    * the overflow rule at every SF. */
  val PackCap = 256L

  /** d_pack: greedy sequence packing — the LLM-pretraining stage that
    * lays documents into fixed-capacity context windows. Docs are ordered
    * within each source by (content-hash, doc_id) — a pure function of
    * content, so the layout is reproducible under any partitioning (the
    * reason NOT to use rand() or input order) — then folded greedily:
    * a doc that would overflow the open bin starts the next one; a doc
    * longer than the cap gets a bin of its own.
    *
    * Packing is inherently sequential WITHIN a stream, so the unit of
    * parallelism is the stream: `groupByKey(source).flatMapGroups` runs
    * one independent fold per source. At 100 TB the stream key becomes
    * (source, shard-of-hash) — thousands of independent folds, each
    * hash-ordered and cap-bounded — with bin ids namespaced per shard;
    * the fold itself is unchanged. This is the rare operator where
    * per-group imperative code IS the Spark-first design: the fold is
    * O(group) with O(1) state, and no window/cumsum formulation
    * reproduces first-fit semantics. */
  def dPack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("source"),
        F.md5(F.col("text").cast("binary")).as("h"),
        F.size(F.split(F.col("text"), " ")).cast("long").as("n"))
      .as[PackDoc]
      .groupByKey(_.source)
      .flatMapGroups { (src: String, it: Iterator[PackDoc]) =>
        // hex md5 under JVM string order ≡ DuckDB VARCHAR order (ASCII)
        val docs = it.toArray.sortBy(d => (d.h, d.doc_id))
        var bin = 0L
        var fill = 0L
        docs.iterator.map { d =>
          if (fill > 0 && fill + d.n > PackCap) { bin += 1; fill = 0 }
          val slot = PackSlot(d.doc_id, src, bin, fill, d.n)
          fill += d.n
          slot
        }
      }
      .toDF()
  }

  /** The identical greedy fold as a recursive CTE: rank docs per source
    * by (md5, doc_id), then advance one rank per recursion step carrying
    * (bin, off) — every source's fold runs in parallel within the CTE. */
  val dPackSql: String =
    s"""WITH RECURSIVE d2 AS (
       |  SELECT doc_id, source, md5(text) AS h,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
       |  FROM documents),
       |pack(source, rn, doc_id, n, bin, off) AS (
       |  SELECT source, rn, doc_id, n, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  FROM d2 WHERE rn = 1
       |  UNION ALL
       |  SELECT d.source, d.rn, d.doc_id, d.n,
       |    CASE WHEN p.off + p.n + d.n > $PackCap THEN p.bin + 1 ELSE p.bin END,
       |    CASE WHEN p.off + p.n + d.n > $PackCap THEN CAST(0 AS BIGINT) ELSE p.off + p.n END
       |  FROM pack p JOIN d2 d ON d.source = p.source AND d.rn = p.rn + 1)
       |SELECT doc_id, source, bin, off, n FROM pack""".stripMargin

  /** d_tfidf: per-document top-3 terms by tf·idf — the classic corpus
    * term-weighting stage (keyword extraction / quality features).
    * idf is the INTEGER surrogate floor(1e6·N/df): exact cross-engine
    * arithmetic with the same ordering as log(N/df) (both decrease in
    * df), where a floating log would flake the gate on libm ulps.
    * Shape: one explode → (doc,term) counts with map-side partials; the
    * doc-frequency table is vocabulary-sized and joins by term; ranking
    * is a per-doc window over ≤ |terms-per-doc| rows. */
  def dTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val n = docs.count()
    // both the tf and df aggregates read the token stream — materialize
    // the explode once (it is the expensive step at corpus scale; at
    // cluster scale: persist(DISK_ONLY))
    val toks = docs.select(F.col("doc_id"),
      F.explode(F.split(F.col("text"), " ")).as("term"))
      .localCheckpoint()
    val tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).as("tf"))
    val df = toks.groupBy("term").agg(F.count_distinct(F.col("doc_id")).as("df"))
    val score = F.col("tf") * F.expr(s"${1000000L * n}L div df")
    tf.join(df, "term")
      .select(F.col("doc_id"), F.col("term"), score.as("score"))
      .withColumn("rnk", F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(F.col("score").desc, F.col("term").asc)))
      .filter(F.col("rnk") <= 3)
      .select("doc_id", "rnk", "term", "score")
  }

  val dTfidfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, term
      |  FROM documents, UNNEST(string_split(text, ' ')) AS u(term)),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS n FROM documents)
      |SELECT doc_id, rnk, term, CAST(score AS BIGINT) AS score FROM (
      |  SELECT tf.doc_id, tf.term, tf.tf * ((1000000 * nn.n) // df.df) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf * ((1000000 * nn.n) // df.df) DESC, tf.term ASC) AS rnk
      |  FROM tf JOIN df USING (term) CROSS JOIN nn)
      |WHERE rnk <= 3""".stripMargin

  /** t_readability: Flesch reading-ease per document in µ-units —
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/word), with
    * syllables approximated by vowel-group count (the standard
    * dictionary-free surrogate) and each ratio floor-scaled ×1e6 so the
    * score is all-BIGINT (single-pass, map-only, regex inside codegen). */
  def tReadability(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(F.col("doc_id"),
        F.size(F.split(F.col("text"), " ")).cast("long").as("words"),
        F.greatest(F.lit(1L),
          F.expr("regexp_count(text, '[.!?]+')").cast("long")).as("sentences"),
        F.expr("regexp_count(lower(text), '[aeiou]+')").cast("long").as("syllables"))
      .select(F.col("doc_id"), F.col("words"), F.col("sentences"), F.col("syllables"),
        (F.lit(206835000L)
          - F.expr("(1015000 * words) div sentences")
          - F.expr("(84600000 * syllables) div words")).as("flesch6"))

  val tReadabilitySql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
      |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS sentences,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS syllables
      |  FROM documents)
      |SELECT doc_id, words, sentences, syllables,
      |  206835000 - ((1015000 * words) // sentences)
      |            - ((84600000 * syllables) // words) AS flesch6
      |FROM m""".stripMargin

  /** d_lm_windows: next-token-prediction training pairs (the data-loader
    * materialization step of LM pretraining — the batch twin of d_pack's
    * sequence assembly): for every position past a 4-token context, emit
    * (context window, target token). Generation is MAP-ONLY — one
    * codegen'd transform+slice per document, no shuffle anywhere (the
    * plan's only exchange is whatever the sink needs) — which is the
    * property that matters when materializing ~10¹² windows at 100 TB.
    * The oracle builds the same pairs via 4 LAG windows — an independent
    * relational formulation. */
  def dLmWindows(s: SparkSession, dir: String): DataFrame = {
    val K = 4
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.split(F.col("text"), " ").as("ws"))
      .select(F.col("doc_id"), F.posexplode(F.expr(
        s"""transform(slice(ws, ${K + 1}, greatest(size(ws) - $K, 0)),
           |  (w, i) -> struct(array_join(slice(ws, i + 1, $K), ' ') AS ctx,
           |                   w AS tgt))""".stripMargin)))
      .select(F.col("doc_id"), F.col("pos").cast("long").as("pos"),
        F.col("col.ctx").as("ctx"), F.col("col.tgt").as("tgt"))
  }

  val dLmWindowsSql: String =
    """WITH toks AS MATERIALIZED (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |pos AS MATERIALIZED (
      |  SELECT doc_id, UNNEST(ws) AS w, generate_subscripts(ws, 1) AS i FROM toks)
      |SELECT doc_id, i - 5 AS pos,
      |  lag(w, 4) OVER win || ' ' || lag(w, 3) OVER win || ' ' ||
      |  lag(w, 2) OVER win || ' ' || lag(w, 1) OVER win AS ctx,
      |  w AS tgt
      |FROM pos
      |WINDOW win AS (PARTITION BY doc_id ORDER BY i)
      |QUALIFY i > 4""".stripMargin

  /** t_bm25: BM25 relevance of every document against the corpus's
    * top-3 terms (the retrieval scorer behind dedup-aware data curation
    * and search-style quality filters; k1 = 1.2, b = 0.75), with
    * d_tfidf's integer-surrogate discipline: idf6 = (10⁶·N) div df
    * replaces the log idf (ln drifts between engines at the last ulp),
    * the length norm is norm6 = 250000 + (750000·dl·N) div Σdl, and a
    * term's score6 = (idf6·tf·2200000) div (10⁶·tf + (12·norm6) div 10)
    * — every division a floor div of nonnegative BIGINTs, so both
    * engines agree bit for bit. Query terms are the most COMMON words
    * by construction, so df ≳ N/10 bounds idf6 ≈ 10⁷ and the widest
    * product idf6·tf·2.2·10⁶ stays far under 2⁶³ at any corpus size.
    * Plan: one explode pass feeds doc lengths, the top-3 term pick, and
    * the per-(doc, term) tf; df/terms/corpus stats all broadcast. */
  def tBm25(s: SparkSession, dir: String): DataFrame = {
    val w = Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.explode(F.split(F.col("text"), " ")).as("word"))
      .localCheckpoint() // feeds four consumers below
    val dl = w.groupBy("doc_id").agg(F.count(F.lit(1)).as("dl"))
    val stats = dl.agg(F.count(F.lit(1)).as("n"), F.sum("dl").as("total"))
    val terms = w.groupBy("word").agg(F.count(F.lit(1)).as("c"))
      .orderBy(F.col("c").desc, F.col("word")).limit(3).select("word")
    val wt = w.join(F.broadcast(terms), "word")
    val df = wt.groupBy("word").agg(F.count_distinct(F.col("doc_id")).as("df"))
    val tf = wt.groupBy("doc_id", "word").agg(F.count(F.lit(1)).as("tf"))
    tf.join(F.broadcast(df), "word").join(dl, "doc_id")
      .crossJoin(F.broadcast(stats))
      .select(F.col("doc_id"),
        F.expr("(1000000 * n) div df").as("idf6"), F.col("tf"),
        F.expr("250000 + (750000 * dl * n) div total").as("norm6"))
      .select(F.col("doc_id"),
        F.expr("(idf6 * tf * 2200000) div (1000000 * tf + (12 * norm6) div 10)")
          .as("ts6"))
      .groupBy("doc_id")
      .agg(F.count(F.lit(1)).as("n_terms"), F.sum("ts6").as("score6"))
  }

  val tBm25Sql: String =
    """WITH w AS (
      |  SELECT doc_id, u.word AS word
      |  FROM documents, UNNEST(string_split(text, ' ')) AS u(word)),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY 1),
      |stats AS (SELECT COUNT(*) AS n, SUM(dl) AS total FROM dl),
      |terms AS (SELECT word FROM (
      |  SELECT word, COUNT(*) AS c FROM w GROUP BY 1
      |  ORDER BY c DESC, word LIMIT 3)),
      |df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w
      |  WHERE word IN (SELECT word FROM terms) GROUP BY 1),
      |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w
      |  WHERE word IN (SELECT word FROM terms) GROUP BY 1, 2),
      |scored AS (
      |  SELECT tf.doc_id,
      |   (1000000 * s.n) // df.df AS idf6, tf.tf,
      |   250000 + (750000 * dl.dl * s.n) // s.total AS norm6
      |  FROM tf JOIN df USING (word) JOIN dl USING (doc_id)
      |  CROSS JOIN stats s)
      |SELECT doc_id, COUNT(*) AS n_terms,
      | CAST(SUM((idf6 * tf * 2200000) // (1000000 * tf + (12 * norm6) // 10)) AS BIGINT) AS score6
      |FROM scored GROUP BY 1""".stripMargin

  /** d_chunk: RAG-style overlapping chunking — every document splits
    * into fixed 480-char windows at a 400-char stride (80-char overlap),
    * the retrieval-index sibling of d_lm_windows' token windows. Chunk
    * counts/spans derive from the precomputed `n_chars` column in closed
    * form (NEVER from length(text): Spark counts UTF-16 units, DuckDB
    * codepoints — n_chars is the engine-neutral length), and the chunk
    * fan-out is a map-only explode(sequence(...)): zero shuffles until
    * the final per-ordinal rollup. Output is one row per chunk ordinal
    * (bounded by max doc length / stride, not corpus size): doc count,
    * summed chunk/overlap lengths, min/max chunk length. */
  def dChunk(s: SparkSession, dir: String): DataFrame = {
    val W = 480L; val S = 400L
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("n_chars").cast("long").as("len"))
      .filter(F.col("len") > 0L)
      .withColumn("n_chunks",
        F.expr(s"CASE WHEN len <= $W THEN CAST(1 AS BIGINT) ELSE (len - $W + ${S - 1}) div $S + 1 END"))
      .withColumn("chunk_no", F.explode(F.expr("sequence(CAST(0 AS BIGINT), n_chunks - 1)")))
      .withColumn("st", F.expr(s"chunk_no * $S"))
      .withColumn("en", F.expr(s"least(st + $W, len)"))
      .withColumn("ov", F.expr(
        s"CASE WHEN chunk_no = 0 THEN CAST(0 AS BIGINT) ELSE least((chunk_no - 1) * $S + $W, len) - st END"))
      .groupBy("chunk_no")
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum(F.col("en") - F.col("st")).as("sum_len"),
        F.sum("ov").as("sum_ov"),
        F.min(F.col("en") - F.col("st")).as("min_len"),
        F.max(F.col("en") - F.col("st")).as("max_len"))
  }

  val dChunkSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS len FROM documents WHERE n_chars > 0),
      |n AS (
      |  SELECT doc_id, len,
      |   CASE WHEN len <= 480 THEN 1 ELSE (len - 480 + 399) // 400 + 1 END AS n_chunks
      |  FROM d),
      |c AS (
      |  SELECT doc_id, len, UNNEST(generate_series(0, n_chunks - 1)) AS chunk_no FROM n),
      |ch AS (
      |  SELECT chunk_no, chunk_no * 400 AS st, LEAST(chunk_no * 400 + 480, len) AS en, len
      |  FROM c)
      |SELECT CAST(chunk_no AS BIGINT) AS chunk_no, COUNT(*) AS n_docs,
      | CAST(SUM(en - st) AS BIGINT) AS sum_len,
      | CAST(SUM(CASE WHEN chunk_no = 0 THEN 0
      |   ELSE LEAST((chunk_no - 1) * 400 + 480, len) - st END) AS BIGINT) AS sum_ov,
      | CAST(MIN(en - st) AS BIGINT) AS min_len,
      | CAST(MAX(en - st) AS BIGINT) AS max_len
      |FROM ch GROUP BY 1""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("d_chunk", dChunk _, Some(dChunkSql)),
    ("d_lm_windows", dLmWindows _, Some(dLmWindowsSql)),
    ("d_pack", dPack _, Some(dPackSql)),
    ("d_tfidf", dTfidf _, Some(dTfidfSql)),
    ("t_bm25", tBm25 _, Some(tBm25Sql)),
    ("t_readability", tReadability _, Some(tReadabilitySql)))
}
