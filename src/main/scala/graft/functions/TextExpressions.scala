package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper shared by interpreted eval and generated code: the k
  * rolling-window MinHash sketch of a string in ONE pass over its bytes.
  * Window j's base hash is xxhash64 over bytes [j, j+width); sketch i
  * tracks min over windows of hashLong(base, seed_i), where seed_i is the
  * precomputed xxhash64 chain seed for the literal i — value-identical to
  * the explode-form `min(xxhash64(lit(i), xxhash64(window)))` on ASCII
  * text, without materializing a row per window. */
object TextOps {
  def rollingMinHash(s: UTF8String, width: Int, seeds: Array[Long]): ArrayData = {
    val mins = Array.fill(seeds.length)(Long.MaxValue)
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var j = 0
    while (j + width <= n) {
      val h = XXH64.hashUnsafeBytes(base, off + j, width, 42L)
      var i = 0
      while (i < seeds.length) {
        val v = XXH64.hashLong(h, seeds(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/** k-value MinHash sketch over all `nWords`-word shingles of a
  * space-separated string, in one pass over its bytes. A shingle's bytes
  * are the contiguous span from the first word's start to the last
  * word's end, which is byte-identical to
  * `concat_ws(' ', w[i..i+nWords-1])` for ANY spacing (empty tokens
  * from repeated spaces reproduce the same bytes), so hashes match the
  * explode formulation exactly. Duplicate shingles can't change a min,
  * so the explode form's DISTINCT is unnecessary here. */
object WordShingleOps {
  def minHash(s: UTF8String, nWords: Int, seeds: Array[Long]): ArrayData = {
    val mins = Array.fill(seeds.length)(Long.MaxValue)
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var spaces = 0
    var p = 0
    while (p < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) spaces += 1
      p += 1
    }
    // starts(i) = byte offset of word i; sentinel start(nw) = n+1 makes
    // end-of-word j = starts(j+1) - 1 uniform for the last word too
    val starts = new Array[Int](spaces + 2)
    var w = 0
    p = 0
    while (p < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) {
        w += 1; starts(w) = p + 1
      }
      p += 1
    }
    val nw = w + 1
    starts(nw) = n + 1
    var i = 0
    while (i + nWords <= nw) {
      val a = starts(i)
      val b = starts(i + nWords) - 1
      val h = XXH64.hashUnsafeBytes(base, off + a, b - a, 42L)
      var j = 0
      while (j < seeds.length) {
        val v = XXH64.hashLong(h, seeds(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** MinHash over word shingles as a single codegen'd expression: the
  * explode formulation ships one row per (doc, shingle) through a
  * distinct AND a grouped 64-column min — two shuffles scaling with
  * total shingle count; this emits k longs per document, map-only. */
case class WordShingleMinHash(str: Expression, nWords: Expression, k: Expression)
  extends TernaryExpression {

  override def first: Expression = str
  override def second: Expression = nWords
  override def third: Expression = k

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType != StringType || nWords.dataType != IntegerType
        || k.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"word_shingle_min_hash needs (string, int, int), got " +
          s"(${str.dataType}, ${nWords.dataType}, ${k.dataType})")
    else if (!nWords.foldable || !k.foldable)
      TypeCheckResult.TypeCheckFailure("word_shingle_min_hash needs constant nWords and k")
    else {
      val (nv, kv) = (nWords.eval(null), k.eval(null))
      if (nv == null || nv.asInstanceOf[Int] < 1 || kv == null || kv.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure("word_shingle_min_hash needs nWords >= 1 and k >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_min_hash"

  @transient private lazy val nw: Int = nWords.eval(null).asInstanceOf[Int]
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k.eval(null).asInstanceOf[Int])(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(s: Any, nv: Any, kv: Any): Any =
    WordShingleOps.minHash(s.asInstanceOf[UTF8String], nw, seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("wsmhSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, (s, _, _) =>
      s"${ev.value} = graft.functions.WordShingleOps.minHash($s, $nw, $seedsRef);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(str = newFirst, nWords = newSecond, k = newThird)
}

/** k-value MinHash sketch over all rolling `width`-byte windows of a
  * string, as array<long> (strings shorter than `width` yield an
  * all-Long.MaxValue sketch — filter them upstream if undesired).
  *
  * The explode formulation ships one row per window through a shuffle
  * (|doc bytes| rows per document); this expression computes the sketch
  * where the document already is — a map-only pass whose output is k
  * longs per document regardless of length, which is what fingerprinting
  * 100 TB of text requires. */
case class RollingMinHash(str: Expression, width: Expression, k: Expression)
  extends TernaryExpression {

  override def first: Expression = str
  override def second: Expression = width
  override def third: Expression = k

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType != StringType || width.dataType != IntegerType
        || k.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"rolling_min_hash needs (string, int, int), got " +
          s"(${str.dataType}, ${width.dataType}, ${k.dataType})")
    else if (!width.foldable || !k.foldable)
      TypeCheckResult.TypeCheckFailure("rolling_min_hash needs constant width and k")
    else {
      val (wv, kv) = (width.eval(null), k.eval(null))
      if (wv == null || wv.asInstanceOf[Int] < 1 || kv == null || kv.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure("rolling_min_hash needs width >= 1 and k >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_min_hash"

  @transient private lazy val w: Int = width.eval(null).asInstanceOf[Int]
  /** seed_i = the xxhash64 running seed after hashing the int literal i —
    * matches `xxhash64(lit(i), h)`'s fold order. */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k.eval(null).asInstanceOf[Int])(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(s: Any, wv: Any, kv: Any): Any =
    TextOps.rollingMinHash(s.asInstanceOf[UTF8String], w, seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("rmhSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, (s, _, _) =>
      s"${ev.value} = graft.functions.TextOps.rollingMinHash($s, $w, $seedsRef);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(str = newFirst, width = newSecond, k = newThird)
}

/** 64-bit SimHash of a space-separated string in one pass: each word's
  * xxhash64 votes ±1 per bit position; fingerprint bit j is set when the
  * votes sum positive. Value-identical to the explode formulation
  * (per-word rows → 64 conditional sums → bit OR) without the explode or
  * the 64-column aggregation. */
object WordSimHashOps {
  def simHash(s: UTF8String): Long = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val votes = new Array[Int](64)
    var wordStart = 0
    var p = 0
    while (p <= n) {
      val atSep = p == n || org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20
      if (atSep) {
        val h = XXH64.hashUnsafeBytes(base, off + wordStart, p - wordStart, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        wordStart = p + 1
      }
      p += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

/** One-pass 64-bit SimHash expression (see [[WordSimHashOps]]). */
case class WordSimHash(str: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def child: Expression = str

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_sim_hash needs a string input, got ${str.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "word_sim_hash"

  override def nullSafeEval(s: Any): Any =
    WordSimHashOps.simHash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.WordSimHashOps.simHash($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(str = newChild)
}

/** Runtime core of [[TrigramLmScore]]: one pass over a doc's bytes,
  * looking each byte-trigram up in a sorted-array model (binary search —
  * compact, serialization-friendly, no boxing). Returns [n_hits,
  * sum_r6]: a trigram ABSENT from the model counts toward neither, the
  * inner-join semantics of the explode formulation this replaces.
  * Byte-trigrams equal character-trigrams only on ASCII text (same
  * caveat as rollingMinHash). */
object TrigramLmOps {
  def score(s: UTF8String, keys: Array[Int], vals: Array[Long]): ArrayData = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var cnt = 0L
    var sum = 0L
    var j = 0
    while (j + 3 <= n) {
      val k =
        ((org.apache.spark.unsafe.Platform.getByte(base, off + j) & 0xFF) << 16) |
        ((org.apache.spark.unsafe.Platform.getByte(base, off + j + 1) & 0xFF) << 8) |
        (org.apache.spark.unsafe.Platform.getByte(base, off + j + 2) & 0xFF)
      val idx = java.util.Arrays.binarySearch(keys, k)
      if (idx >= 0) { cnt += 1; sum += vals(idx) }
      j += 1
    }
    new GenericArrayData(Array(cnt, sum))
  }
}

/** Runtime core of [[NgramJaccardHits]]: the DISTINCT byte-trigram count
  * of a string plus how many of those distinct trigrams appear in a
  * constant (sorted) query-key array — one pass, one scratch
  * open-addressing set per row, zero per-position allocation (the
  * array_distinct/array_intersect form allocates a UTF8String per
  * position). Keys are 24-bit byte triples: exact for ASCII text, a
  * byte-level trigram family otherwise (rollingMinHash's caveat). */
object NgramSetOps {
  def distinctAndHits(s: UTF8String, qKeys: Array[Int]): ArrayData = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val windows = math.max(0, n - 2)
    // open addressing at load factor <= 0.5; slot stores key+1 (0 = empty)
    var cap = 16
    while (cap < windows * 2) cap <<= 1
    val table = new Array[Int](cap)
    val mask = cap - 1
    var distinct = 0L
    var hits = 0L
    var j = 0
    while (j + 3 <= n) {
      val k =
        ((org.apache.spark.unsafe.Platform.getByte(base, off + j) & 0xFF) << 16) |
        ((org.apache.spark.unsafe.Platform.getByte(base, off + j + 1) & 0xFF) << 8) |
        (org.apache.spark.unsafe.Platform.getByte(base, off + j + 2) & 0xFF)
      // fibonacci hashing; -1640531527 == 0x9E3779B9 as a signed int
      var slot = (k * -1640531527) >>> (32 - Integer.numberOfTrailingZeros(cap))
      slot &= mask
      var seen = false
      var probing = true
      while (probing) {
        val v = table(slot)
        if (v == 0) probing = false
        else if (v == k + 1) { seen = true; probing = false }
        else slot = (slot + 1) & mask
      }
      if (!seen) {
        table(slot) = k + 1
        distinct += 1
        if (java.util.Arrays.binarySearch(qKeys, k) >= 0) hits += 1
      }
      j += 1
    }
    new GenericArrayData(Array(distinct, hits))
  }
}

/** Distinct-trigram count + query-set hit count as ONE map-only codegen'd
  * expression — the whole ngram-search scoring stage with no per-gram
  * rows, no allocation per position, and the query set riding as a
  * sorted reference array. */
case class NgramJaccardHits(str: Expression, qKeys: Array[Int])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def child: Expression = str
  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ngram_jaccard_hits needs a string input, got ${str.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_jaccard_hits"

  override def nullSafeEval(s: Any): Any =
    NgramSetOps.distinctAndHits(s.asInstanceOf[UTF8String], qKeys)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("njhKeys", qKeys, "int[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NgramSetOps.distinctAndHits($s, $keysRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(str = newChild)
}

/** Per-document trigram-LM scoring as ONE map-only expression: the
  * trained model (trigram → r6 ratio) rides as two reference arrays, so
  * scoring never explodes the corpus into per-trigram rows — the explode
  * → broadcast-join → groupBy(doc) formulation ships one row per corpus
  * CHARACTER through the join; this ships two longs per document.
  * The model is charset³-bounded regardless of corpus size. */
case class TrigramLmScore(str: Expression, keys: Array[Int], vals: Array[Long])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(keys.length == vals.length, "model arrays must align")

  override def child: Expression = str
  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"trigram_lm_score needs a string input, got ${str.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_lm_score"

  override def nullSafeEval(s: Any): Any =
    TrigramLmOps.score(s.asInstanceOf[UTF8String], keys, vals)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("triLmKeys", keys, "int[]")
    val valsRef = ctx.addReferenceObj("triLmVals", vals, "long[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TrigramLmOps.score($s, $keysRef, $valsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(str = newChild)
}

/** Per-document byte-trigram HISTOGRAM in one pass: packed
  * (key << 32 | count) longs, one entry per distinct trigram of the
  * document. This is per-document partial aggregation for the corpus
  * trigram-count shuffle: the explode formulation ships one row (and
  * allocates one UTF8String) per CHARACTER POSITION, this ships one
  * packed long per DISTINCT per-doc trigram (≤ min(positions, charset³);
  * ~3× fewer rows and zero allocation per position on this corpus).
  * Keys are the 24-bit byte triples of [[TrigramLmOps.score]] — exact
  * character trigrams for ASCII text (rollingMinHash's caveat) and, for
  * ASCII, packed-int order ≡ lexical trigram order, so downstream
  * `ORDER BY count DESC, key` matches the oracle's `ORDER BY c3 DESC,
  * tri`. Open addressing at load ≤ 0.5, same discipline as
  * [[NgramSetOps]]. */
object TrigramCountOps {
  def counts(s: UTF8String): ArrayData = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val windows = math.max(0, n - 2)
    if (windows == 0) return new GenericArrayData(Array.empty[Long])
    // distinct keys are bounded by the 24-bit key space, so the table
    // never needs more than 2^25 slots (load ≤ 0.5) — the cap also
    // keeps Int arithmetic safe for pathological multi-hundred-MB rows
    // (2*windows would overflow) and bounds per-row allocation
    val want = math.min(2L * windows, 1L << 25)
    var cap = 16
    while (cap < want) cap <<= 1
    val keyTab = new Array[Int](cap)   // key+1; 0 = empty
    val cntTab = new Array[Int](cap)
    val mask = cap - 1
    var distinct = 0
    var j = 0
    while (j + 3 <= n) {
      val k =
        ((org.apache.spark.unsafe.Platform.getByte(base, off + j) & 0xFF) << 16) |
        ((org.apache.spark.unsafe.Platform.getByte(base, off + j + 1) & 0xFF) << 8) |
        (org.apache.spark.unsafe.Platform.getByte(base, off + j + 2) & 0xFF)
      var slot = (k * -1640531527) >>> (32 - Integer.numberOfTrailingZeros(cap))
      slot &= mask
      var probing = true
      while (probing) {
        val v = keyTab(slot)
        if (v == 0) {
          keyTab(slot) = k + 1; cntTab(slot) = 1; distinct += 1; probing = false
        } else if (v == k + 1) { cntTab(slot) += 1; probing = false }
        else slot = (slot + 1) & mask
      }
      j += 1
    }
    val out = new Array[Long](distinct)
    var i = 0
    var w = 0
    while (i < cap) {
      if (keyTab(i) != 0) {
        // mask the count: an Int count can in principle wrap negative
        // on a pathological row, and sign extension would corrupt the
        // key bits (counts stay exact for any row under 2 GiB, the
        // UTF8String bound, because each window counts once)
        out(w) = ((keyTab(i) - 1).toLong << 32) | (cntTab(i).toLong & 0xFFFFFFFFL)
        w += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** The per-doc trigram histogram as a codegen'd expression — see
  * [[TrigramCountOps]]. */
case class TrigramCounts(str: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def child: Expression = str

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"trigram_counts needs string, got ${str.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_counts"

  override def nullSafeEval(s: Any): Any =
    TrigramCountOps.counts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TrigramCountOps.counts($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(str = newChild)
}

object TextFunctions {
  /** One-pass rolling-window MinHash sketch (codegen'd).
    *
    * Windows are `width` BYTES of the string's UTF-8 encoding, not
    * characters — equal to character windows only for ASCII text. On
    * multi-byte text the windows slide through code points (still a valid,
    * deterministic shingle family, just a byte-level one). Callers guarding
    * "has at least one window" must therefore test `octet_length(str) >=
    * width`, not character `length`. A string with fewer than `width` bytes
    * yields the empty-sketch sentinel (Long.MaxValue per lane). */
  def rollingMinHash(str: Column, width: Int, k: Int): Column =
    GraftSqlBridge.column(RollingMinHash(GraftSqlBridge.expression(str),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(width)),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(k))))

  /** One-pass word-shingle MinHash sketch (codegen'd). */
  def wordShingleMinHash(str: Column, nWords: Int, k: Int): Column =
    GraftSqlBridge.column(WordShingleMinHash(GraftSqlBridge.expression(str),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(nWords)),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(k))))

  /** One-pass 64-bit word SimHash (codegen'd). */
  def wordSimHash(str: Column): Column =
    GraftSqlBridge.column(WordSimHash(GraftSqlBridge.expression(str)))

  /** One-pass distinct-trigram + query-hit counter (codegen'd): returns
    * array(n_distinct_grams, n_query_hits). `qKeys` are 24-bit ASCII
    * byte-trigram keys; ordering is handled here. */
  def ngramJaccardHits(str: Column, qKeys: Seq[Int]): Column =
    GraftSqlBridge.column(NgramJaccardHits(GraftSqlBridge.expression(str),
      qKeys.sorted.toArray))

  /** One-pass per-doc trigram histogram (codegen'd): array of packed
    * (24-bit byte-trigram key << 32 | count) longs, one per distinct
    * per-doc trigram — per-document partial aggregation for corpus
    * trigram counting. */
  def trigramCounts(str: Column): Column =
    GraftSqlBridge.column(TrigramCounts(GraftSqlBridge.expression(str)))

  /** One-pass trigram-LM scorer over a driver-trained model (codegen'd):
    * returns array(n_model_trigrams, sum_r6). `model` maps the 24-bit
    * ASCII byte-trigram key to its r6 ratio; entries must be unique. */
  def trigramLmScore(str: Column, model: Seq[(Int, Long)]): Column = {
    val sorted = model.sortBy(_._1).toArray
    GraftSqlBridge.column(TrigramLmScore(GraftSqlBridge.expression(str),
      sorted.map(_._1), sorted.map(_._2)))
  }
}
