package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

import graft.Tables

/** Multimodal (binary-column) pipeline plumbing (builder mandate).
  *
  * Media lives as an opaque `binary` column + typed metadata. Decode /
  * feature-extract runs as a typed `mapPartitions` over `Dataset[T]` —
  * the same batched per-partition shape a real decoder (or `mapInPandas`
  * on the Python side) plugs into. The decode itself is a clearly-marked
  * DETERMINISTIC STUB (the container has no image/audio libs), computed
  * from byte length/content only, so a SQL oracle can replicate it and
  * the whole Spark-side plumbing — schema, encoders, partitioning, batch
  * shape — is verified end-to-end.
  */
object MediaQueries {
  type Q = (SparkSession, String) => DataFrame

  final case class MediaBlob(doc_id: Long, blob: Array[Byte])
  final case class MediaMeta(doc_id: Long, fmt: String, width: Int, height: Int,
                             n_bytes: Long, checksum: Long)

  /** DETERMINISTIC DECODE STUB — stands in for an image decoder. Derives
    * "metadata" purely from the bytes so the oracle can reproduce it:
    * fmt from n%3, dims from simple modular arithmetic, checksum = sum of
    * unsigned byte values. A real deployment swaps only this function. */
  def stubDecode(m: MediaBlob): MediaMeta = {
    val n = m.blob.length.toLong
    val fmt = (n % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    var sum = 0L
    var i = 0
    while (i < m.blob.length) { sum += m.blob(i) & 0xFF; i += 1 }
    MediaMeta(m.doc_id, fmt,
      width = (64 + (n * 7) % 512).toInt,
      height = (64 + (n * 13) % 512).toInt,
      n_bytes = n, checksum = sum)
  }

  /** m_media_meta: binary column → typed metadata via per-partition
    * decode. The blob is the UTF-8 bytes of `text` (the synthetic corpus
    * has no real media); everything downstream treats it as opaque. */
  def mMediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("text").cast("binary").as("blob"))
      .as[MediaBlob]
    blobs.mapPartitions(_.map(stubDecode)).toDF()
  }

  /** Oracle: same arithmetic over the UTF-8 byte length and byte sum.
    * The corpus is pure ASCII (driver-verified: octet_length == length
    * for every row), so the byte sum equals the codepoint sum DuckDB can
    * compute with ord(substr(...)). */
  val mMediaMetaSql: String =
    """SELECT doc_id,
      |  CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS fmt,
      |  CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INTEGER) AS width,
      |  CAST(64 + (octet_length(encode(text)) * 13) % 512 AS INTEGER) AS height,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, length(text) + 1),
      |      i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))), (a, x) -> a + x) AS checksum
      |FROM documents""".stripMargin

  final case class MediaFrame(doc_id: Long, frame_idx: Long, frame_len: Long, checksum: Long)

  /** DETERMINISTIC FRAME-SAMPLING STUB — stands in for video frame
    * extraction (one-to-many decode). Splits the blob into 1 + n%4 equal
    * slices (remainder dropped) and checksums each; a real decoder swaps
    * only this function, the flatMap plumbing is identical. */
  def stubFrames(m: MediaBlob): Seq[MediaFrame] = {
    val n = m.blob.length
    val nf = 1 + n % 4
    val flen = n / nf
    (0 until nf).map { f =>
      var sum = 0L
      var i = f * flen
      while (i < f * flen + flen) { sum += m.blob(i) & 0xFF; i += 1 }
      MediaFrame(m.doc_id, f.toLong, flen.toLong, sum)
    }
  }

  /** m_media_frames: one-to-many media decode (frame sampling) — the
    * per-partition batched flatMap shape a real video pipeline uses. */
  def mMediaFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("text").cast("binary").as("blob"))
      .as[MediaBlob]
      .mapPartitions(_.flatMap(stubFrames))
      .toDF()
  }

  /** Oracle: same slicing arithmetic over ASCII codepoints (== bytes). */
  val mMediaFramesSql: String =
    """WITH m AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    1 + length(text) % 4 AS nf,
      |    length(text) // (1 + length(text) % 4) AS flen
      |  FROM documents)
      |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, CAST(flen AS BIGINT) AS frame_len,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1 + f * flen, 1 + f * flen + flen),
      |      i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))), (a, x) -> a + x) AS checksum
      |FROM m, UNNEST(range(0, nf)) AS u(f)""".stripMargin

  final case class MediaResized(doc_id: Long, out_w: Int, out_h: Int,
                                stride: Long, checksum: Long)

  /** DETERMINISTIC RESIZE STUB — stands in for image downscaling: fixed
    * 64×64 output, "sampling" every stride-th byte (stride sized so ≤4096
    * samples survive, the 1-D analogue of nearest-neighbor downsampling).
    * A real decoder swaps only this function. */
  def stubResize(m: MediaBlob): MediaResized = {
    val n = m.blob.length
    val stride = math.max(1L, n.toLong / 4096L)
    var sum = 0L
    var i = 0L
    while (i < n) { sum += m.blob(i.toInt) & 0xFF; i += stride }
    MediaResized(m.doc_id, 64, 64, stride, sum)
  }

  /** m_media_resize: one-to-one media transform with data-dependent
    * sampling — the resize shape of the pipeline. */
  def mMediaResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("text").cast("binary").as("blob"))
      .as[MediaBlob]
      .mapPartitions(_.map(stubResize))
      .toDF()
  }

  val mMediaResizeSql: String =
    """WITH m AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    greatest(1, length(text) // 4096) AS stride
      |  FROM documents)
      |SELECT doc_id, CAST(64 AS INTEGER) AS out_w, CAST(64 AS INTEGER) AS out_h,
      |  CAST(stride AS BIGINT) AS stride,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, n + 1, CAST(stride AS INTEGER)),
      |      i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))), (a, x) -> a + x) AS checksum
      |FROM m""".stripMargin

  final case class MediaFeat(doc_id: Long, f0: Long, f1: Long, f2: Long, f3: Long,
                             f4: Long, f5: Long, f6: Long, f7: Long)

  /** DETERMINISTIC FEATURE-EXTRACT STUB — stands in for an embedding
    * model: an 8-bin byte "histogram" (sum of byte values by position mod
    * 8). Fixed-width typed output, exactly the shape a real encoder
    * produces; only this function changes in deployment. */
  def stubFeatures(m: MediaBlob): MediaFeat = {
    val f = new Array[Long](8)
    var i = 0
    while (i < m.blob.length) { f(i % 8) += m.blob(i) & 0xFF; i += 1 }
    MediaFeat(m.doc_id, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
  }

  /** m_media_features: binary column → fixed-dim feature columns. */
  def mMediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("text").cast("binary").as("blob"))
      .as[MediaBlob]
      .mapPartitions(_.map(stubFeatures))
      .toDF()
  }

  val mMediaFeaturesSql: String = {
    val bins = (0 until 8).map { j =>
      s"""  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(${j + 1}, n + 1, 8),
         |      i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))), (a, x) -> a + x) AS f$j"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH m AS (SELECT doc_id, text, length(text) AS n FROM documents)
       |SELECT doc_id,
       |$bins
       |FROM m""".stripMargin
  }

  final case class MediaPhash(doc_id: Long, h_hi: Long, h_lo: Long)

  /** DETERMINISTIC PERCEPTUAL-HASH STUB — a 64-bit SimHash over the
    * blob's 2-shingle set with md5 as the per-feature bit source (split
    * into two 32-bit halves so every SQL-side constant stays positive).
    * A real image pHash swaps only the feature stage (DCT coefficients
    * for shingles); the sketch/band/verify plumbing is identical. */
  def stubPhash(m: MediaBlob): Option[MediaPhash] = {
    val ws = new String(m.blob, java.nio.charset.StandardCharsets.UTF_8).split(" ")
    // A doc with < 2 words has an empty shingle set — no features means no
    // hash (the all-zero hash would pair every such doc at hamming 0 and
    // collapse into one giant band group at scale); the oracle's
    // `len(ws) >= 2` predicate excludes them identically.
    if (ws.length < 2) return None
    val sh = (0 until ws.length - 1).map(i => ws(i) + " " + ws(i + 1)).distinct
    val v = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    sh.foreach { w =>
      val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < 64) {
        v(j) += (if (((d(j / 8) >> (j % 8)) & 1) == 1) 1 else -1)
        j += 1
      }
    }
    var hi = 0L
    var lo = 0L
    (0 until 32).foreach { j => if (v(j) > 0) lo |= 1L << j }
    (32 until 64).foreach { j => if (v(j) > 0) hi |= 1L << (j - 32) }
    Some(MediaPhash(m.doc_id, hi, lo))
  }

  /** m_media_phash: perceptual-hash near-duplicate detection — the
    * media-dedup stage (same sketch→band→verify shape as MinHash-LSH).
    * Candidates join on any of 4 16-bit bands; hamming ≤ 3 is then
    * verified exactly. With 4 bands, ≤ 3 differing bits CANNOT touch
    * every band (pigeonhole), so banded candidates provably cover every
    * threshold pair — the oracle is the plain all-pairs hamming join,
    * and the banding is pure (shuffle-sized) optimization. */
  def mMediaPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("text").cast("binary").as("blob"))
      .as[MediaBlob]
      .mapPartitions(_.flatMap(stubPhash)).toDF()
      .localCheckpoint() // both self-join sides read the hash pipeline
    val bands = hashed.select(F.col("doc_id"), F.col("h_hi"), F.col("h_lo"),
      F.posexplode(F.array(
        F.col("h_lo") % 65536L, F.expr("h_lo div 65536"),
        F.col("h_hi") % 65536L, F.expr("h_hi div 65536"))).as(Seq("b", "v")))
    val x = bands.select(F.col("b"), F.col("v"), F.col("doc_id").as("a_id"),
      F.col("h_hi").as("ahi"), F.col("h_lo").as("alo"))
    val y = bands.select(F.col("b"), F.col("v"), F.col("doc_id").as("b_id"),
      F.col("h_hi").as("bhi"), F.col("h_lo").as("blo"))
    x.join(y, Seq("b", "v")).filter(F.col("a_id") < F.col("b_id"))
      .select(F.col("a_id"), F.col("b_id"),
        F.expr("bit_count(ahi ^ bhi) + bit_count(alo ^ blo)").cast("long").as("hamming"))
      .distinct() // a close pair shares several bands
      .filter(F.col("hamming") <= 3)
  }

  final case class AudioFrame(doc_id: Long, f: Long, e: Long)

  /** DETERMINISTIC DECODE STUB — stands in for an audio decoder: the
    * blob's bytes ARE the PCM samples, framed 20 samples per frame,
    * frame energy = sum of unsigned byte values. A real deployment swaps
    * only this function (decode → PCM → per-frame energy). */
  def stubAudioFrames(m: MediaBlob): Iterator[AudioFrame] = {
    val nf = m.blob.length / 20
    (0 until nf).iterator.map { i =>
      var e = 0L
      var j = 20 * i
      while (j < 20 * (i + 1)) { e += m.blob(j) & 0xFF; j += 1 }
      AudioFrame(m.doc_id, i.toLong, e)
    }
  }

  /** m_media_vad: energy-threshold VOICE-ACTIVITY segmentation — the
    * audio-shaped member of the multimodal family (meta/frames/resize/
    * features cover images, scene_cut video): per-partition decode to
    * frame energies (stub), voiced = energy > 2000, maximal same-flag
    * runs via the gaps-and-islands window; per doc: frame/voiced
    * counts, segment count, longest voiced run. The segmentation runs
    * per-doc-partitioned windows — bounded by clip length, never corpus
    * size. */
  def mMediaVad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frames = Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("text").cast("binary").as("blob"))
      .as[MediaBlob]
      .filter(F.expr("length(blob) >= 20"))
      .mapPartitions(_.flatMap(stubAudioFrames)).toDF()
    val w = Window.partitionBy("doc_id").orderBy("f")
    val seg = frames
      .withColumn("voiced", (F.col("e") > 2000L).cast("long"))
      .withColumn("brk",
        F.when(F.lag("voiced", 1).over(w).isNull ||
          F.lag("voiced", 1).over(w) =!= F.col("voiced"), 1L).otherwise(0L))
      .withColumn("sid", F.sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = seg.groupBy("doc_id", "sid")
      .agg(F.max("voiced").as("voiced"), F.count(F.lit(1)).as("len"))
    runs.groupBy("doc_id")
      .agg(F.sum("len").as("n_frames"),
        F.sum(F.when(F.col("voiced") === 1L, F.col("len")).otherwise(0L))
          .as("n_voiced"),
        F.max("sid").as("n_segments"),
        F.coalesce(F.max(F.when(F.col("voiced") === 1L, F.col("len"))), F.lit(0L))
          .as("max_voiced_run"))
  }

  val mMediaVadSql: String =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) // 20 AS nf FROM documents
      |  WHERE length(text) >= 20),
      |fr AS (
      |  SELECT doc_id, i AS f, SUM(ord(substr(text, 20 * i + j + 1, 1))) AS e
      |  FROM d, UNNEST(range(0, nf)) AS u(i), UNNEST(range(0, 20)) AS v(j)
      |  GROUP BY 1, 2),
      |vv AS (
      |  SELECT doc_id, f, CASE WHEN e > 2000 THEN 1 ELSE 0 END AS voiced FROM fr),
      |runs AS (
      |  SELECT doc_id, f, voiced,
      |   CASE WHEN LAG(voiced) OVER w IS NULL
      |         OR LAG(voiced) OVER w <> voiced THEN 1 ELSE 0 END AS brk
      |  FROM vv WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
      |segd AS (
      |  SELECT doc_id, voiced,
      |   SUM(brk) OVER (PARTITION BY doc_id ORDER BY f ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM runs),
      |per AS (
      |  SELECT doc_id, sid, MAX(voiced) AS voiced, COUNT(*) AS len
      |  FROM segd GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(len) AS BIGINT) AS n_frames,
      | CAST(SUM(CASE WHEN voiced = 1 THEN len ELSE 0 END) AS BIGINT) AS n_voiced,
      | CAST(MAX(sid) AS BIGINT) AS n_segments,
      | CAST(COALESCE(MAX(CASE WHEN voiced = 1 THEN len END), 0) AS BIGINT) AS max_voiced_run
      |FROM per GROUP BY 1""".stripMargin

  /** m_media_dedup: the full MEDIA near-dup chain — phash band
    * candidates → verified hamming ≤ 3 pairs (m_media_phash, provably ⊇
    * threshold pairs by pigeonhole) → connected components via the
    * frontier Pregel → keep-min canonical per component → per-source
    * survival accounting: the media sibling of d_fuzzy_e2e, i.e. the
    * composition a multimodal ingestion actually runs. Oracle = the
    * all-pairs hamming closure (recursive CTE), so the banded + Pregel
    * path is hash-gated against the exact transitive closure. */
  def mMediaDedup(s: SparkSession, dir: String): DataFrame = {
    val pairs = mMediaPhash(s, dir).select("a_id", "b_id").localCheckpoint()
    val sym = pairs.select(F.col("a_id").as("src"), F.col("b_id").as("dst"))
      .unionByName(pairs.select(F.col("b_id").as("src"), F.col("a_id").as("dst")))
    val docs = Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("source"))
    val comp = graft.graph.Pregel.minPropagate(
      docs.select(F.col("doc_id").as("vid"), F.col("doc_id").as("x")),
      identity, sym, F.col("x"), maxIter = 10)
      .select(F.col("vid").as("doc_id"), F.col("x").as("keep_id"))
    docs.join(comp, Seq("doc_id"))
      .groupBy("source")
      .agg(F.count(F.lit(1)).as("n_media"),
        F.sum(F.when(F.col("doc_id") === F.col("keep_id"), 1L).otherwise(0L))
          .as("n_kept"),
        F.sum(F.when(F.col("doc_id") =!= F.col("keep_id"), 1L).otherwise(0L))
          .as("n_removed"))
  }

  val mMediaDedupSql: String =
    """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS s
      |  FROM w, UNNEST(range(1, len(ws))) AS u(i) WHERE len(ws) >= 2),
      |bits AS (
      |  SELECT doc_id, j,
      |    ((((strpos('0123456789abcdef', substr(md5(s), 2*(j//8)+1, 1)) - 1) * 16
      |       + strpos('0123456789abcdef', substr(md5(s), 2*(j//8)+2, 1)) - 1)
      |      >> (j % 8)) & 1) AS bit
      |  FROM sh, UNNEST(range(0, 64)) AS u(j)),
      |votes AS (SELECT doc_id, j, SUM(2*bit - 1) AS v FROM bits GROUP BY 1, 2),
      |h AS (SELECT doc_id,
      |  CAST(SUM(CASE WHEN v > 0 AND j < 32 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS h_lo,
      |  CAST(SUM(CASE WHEN v > 0 AND j >= 32 THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS BIGINT) AS h_hi
      |  FROM votes GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM h a JOIN h b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.h_hi, b.h_hi)) + bit_count(xor(a.h_lo, b.h_lo)) <= 3),
      |sym(s, d) AS (SELECT a_id, b_id FROM pairs UNION SELECT b_id, a_id FROM pairs),
      |reach(v, u) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT r.v, e.d FROM reach r JOIN sym e ON e.s = r.u),
      |canon AS (SELECT v AS doc_id, MIN(u) AS keep_id FROM reach GROUP BY v)
      |SELECT d.source, COUNT(*) AS n_media,
      |  CAST(SUM(CASE WHEN d.doc_id = canon.keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN d.doc_id <> canon.keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
      |FROM documents d JOIN canon ON canon.doc_id = d.doc_id
      |GROUP BY 1""".stripMargin

  /** Oracle: identical hash arithmetic (md5 hex digits → digest bytes),
    * then the PLAIN all-pairs hamming join — no band condition, see
    * [[mMediaPhash]]'s pigeonhole argument. */
  val mMediaPhashSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS s
      |  FROM w, UNNEST(range(1, len(ws))) AS u(i) WHERE len(ws) >= 2),
      |bits AS (
      |  SELECT doc_id, j,
      |    ((((strpos('0123456789abcdef', substr(md5(s), 2*(j//8)+1, 1)) - 1) * 16
      |       + strpos('0123456789abcdef', substr(md5(s), 2*(j//8)+2, 1)) - 1)
      |      >> (j % 8)) & 1) AS bit
      |  FROM sh, UNNEST(range(0, 64)) AS u(j)),
      |votes AS (SELECT doc_id, j, SUM(2*bit - 1) AS v FROM bits GROUP BY 1, 2),
      |h AS (SELECT doc_id,
      |  CAST(SUM(CASE WHEN v > 0 AND j < 32 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS h_lo,
      |  CAST(SUM(CASE WHEN v > 0 AND j >= 32 THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS BIGINT) AS h_hi
      |  FROM votes GROUP BY 1)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(bit_count(xor(a.h_hi, b.h_hi)) + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS hamming
      |FROM h a JOIN h b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.h_hi, b.h_hi)) + bit_count(xor(a.h_lo, b.h_lo)) <= 3""".stripMargin

  /** m_media_clip_pairs: the multimodal training-pair ASSEMBLY stage
    * (CLIP-style caption↔media pairing): join the caption table to the
    * media blob's decoded metadata and the embedding table, gate each
    * modality independently — media must be a keepable format with both
    * dims ≥ 100 and aspect within [0.5, 2] (the standard pretraining
    * crop gate), captions must be ≥ 20 words — and emit the aligned
    * pair rows. All gates are codegen'd pushed predicates; the
    * doc⋈embedding join is an unhinted equi-join (both sides SF-scaled,
    * AQE sizes it). The decode is the same deterministic stub as
    * m_media_meta, so the oracle replays the identical arithmetic. */
  def mMediaClipPairs(s: SparkSession, dir: String): DataFrame = {
    val n = F.octet_length(F.col("text")).cast("long")
    val meta = Tables(s, dir, "documents")
      .select(F.col("doc_id"), F.col("lang"),
        F.expr("size(split(text, ' '))").cast("long").as("n_words"),
        F.when(n % 3 === 0, "jpeg").when(n % 3 === 1, "png").otherwise("webp").as("fmt"),
        (F.lit(64) + (n * 7) % 512).cast("long").as("width"),
        (F.lit(64) + (n * 13) % 512).cast("long").as("height"))
    val emb = Tables(s, dir, "embeddings")
      .select(F.col("vec_id").as("doc_id"), F.col("label").cast("long").as("label"))
    meta.join(emb, "doc_id")
      .withColumn("aspect_ppm", F.expr("width * 1000000 div height"))
      .filter(F.col("fmt") =!= "webp"
        && F.col("width") >= 100 && F.col("height") >= 100
        && F.col("aspect_ppm").between(500000L, 2000000L)
        && F.col("n_words") >= 20)
      .select("doc_id", "lang", "fmt", "width", "height", "n_words", "aspect_ppm", "label")
  }

  val mMediaClipPairsSql: String =
    """WITH meta AS (
      |  SELECT doc_id, lang,
      |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |   CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS fmt,
      |   CAST(64 + (octet_length(encode(text)) * 7) % 512 AS BIGINT) AS width,
      |   CAST(64 + (octet_length(encode(text)) * 13) % 512 AS BIGINT) AS height
      |  FROM documents)
      |SELECT m.doc_id, m.lang, m.fmt, m.width, m.height, m.n_words,
      | CAST(m.width * 1000000 // m.height AS BIGINT) AS aspect_ppm,
      | CAST(e.label AS BIGINT) AS label
      |FROM meta m JOIN embeddings e ON e.vec_id = m.doc_id
      |WHERE m.fmt <> 'webp' AND m.width >= 100 AND m.height >= 100
      |  AND m.width * 1000000 // m.height BETWEEN 500000 AND 2000000
      |  AND m.n_words >= 20""".stripMargin

  /** m_media_scene_cut: scene segmentation over the sampled frame stream
    * (the video-pipeline step after frame extraction: split a clip where
    * consecutive frames differ sharply — here the frame-diff signal is
    * |Δchecksum| > frame_len·5, i.e. mean per-byte change > 5, on the
    * SAME deterministic frame stubs m_media_frames gates, so a real
    * frame-difference metric swaps in without touching the plumbing).
    * One lag window over the ≤4-frames-per-doc stream + one grouped
    * rollup: per media, frame count, cut count, and first cut index
    * (−1 when the clip is one scene). */
  def mMediaSceneCut(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    val cut = F.col("prev").isNotNull &&
      F.abs(F.col("checksum") - F.col("prev")) > F.col("frame_len") * 5
    mMediaFrames(s, dir)
      .withColumn("prev", F.lag("checksum", 1).over(w))
      .withColumn("cut", cut)
      .groupBy("doc_id")
      .agg(F.count(F.lit(1)).as("n_frames"),
        F.sum(F.when(F.col("cut"), 1L).otherwise(0L)).as("n_cuts"),
        F.coalesce(F.min(F.when(F.col("cut"), F.col("frame_idx"))), F.lit(-1L))
          .as("first_cut"))
  }

  val mMediaSceneCutSql: String =
    s"""WITH fr AS ($mMediaFramesSql),
       |lagd AS (
       |  SELECT doc_id, frame_idx, frame_len, checksum,
       |    lag(checksum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
       |  FROM fr)
       |SELECT doc_id, COUNT(*) AS n_frames,
       |  CAST(SUM(CASE WHEN prev IS NOT NULL AND abs(checksum - prev) > frame_len * 5
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       |  COALESCE(MIN(CASE WHEN prev IS NOT NULL AND abs(checksum - prev) > frame_len * 5
       |    THEN frame_idx END), -1) AS first_cut
       |FROM lagd GROUP BY doc_id""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("m_media_scene_cut", mMediaSceneCut _, Some(mMediaSceneCutSql)),
    ("m_media_clip_pairs", mMediaClipPairs _, Some(mMediaClipPairsSql)),
    ("m_media_phash", mMediaPhash _, Some(mMediaPhashSql)),
    ("m_media_dedup", mMediaDedup _, Some(mMediaDedupSql)),
    ("m_media_vad", mMediaVad _, Some(mMediaVadSql)),
    ("m_media_meta", mMediaMeta _, Some(mMediaMetaSql)),
    ("m_media_frames", mMediaFrames _, Some(mMediaFramesSql)),
    ("m_media_resize", mMediaResize _, Some(mMediaResizeSql)),
    ("m_media_features", mMediaFeatures _, Some(mMediaFeaturesSql)))
}
