package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.{functions => F}

/** Misra-Gries frequent-items sketch as a custom Catalyst aggregate — the
  * ClickHouse `topK()` analogue.
  *
  * The exact formulation (groupBy(group, term).count + window) shuffles
  * one row per DISTINCT (group, term); over a 100 TB corpus with an
  * unbounded term domain that intermediate is itself huge. This aggregate
  * keeps at most `capacity` counters per group, gets map-side partial
  * aggregation for free (shuffle volume O(groups × capacity)), and merges
  * with the Agarwal et al. mergeable-summaries rule, so the result is
  * identical under any partitioning.
  *
  * Guarantees (n = group's total item count, m = capacity):
  *   true − n/(m+1) ≤ estimate ≤ true,
  * and any item with true count > n/(m+1) is present in the summary.
  * When a group's distinct-item count never exceeds `capacity`, no
  * decrement ever fires and the counts are EXACT — the regime the oracle
  * check runs in (bounded vocabularies); the spec covers the approximate
  * regime's bounds.
  */
/** Misra-Gries buffer in the GLOBAL-OFFSET representation: a counter's
  * effective count is `raw − offset`. The MG "decrement every counter"
  * step becomes `offset += d` — O(1) instead of a full-map rewrite — so a
  * cache miss costs one min-scan, not three map passes. This matters
  * exactly in the open-vocabulary regime (distinct terms ≫ capacity,
  * i.e. the 100 TB case) where most arrivals miss. Serialization and
  * eval always materialize effective counts, so the representation is
  * invisible outside the buffer. */
final class MGBuffer {
  val m: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var offset: Long = 0L
  // ordered index raw-count → terms at that count, kept in lockstep with
  // `m` by the offer path: min lookup O(log m), eviction O(#evicted).
  // Without it every miss on a full map pays an O(capacity) min-scan —
  // capacity-quadratic behavior in exactly the open-vocabulary regime
  // (distinct ≫ capacity, the 100 TB case; weighted arrivals make it
  // bite hardest because large weights force the eviction path often).
  val idx: java.util.TreeMap[Long, java.util.ArrayList[String]] =
    new java.util.TreeMap[Long, java.util.ArrayList[String]]

  def idxAdd(raw: Long, t: String): Unit = {
    var l = idx.get(raw)
    if (l == null) { l = new java.util.ArrayList[String](1); idx.put(raw, l) }
    l.add(t)
  }

  def idxRemove(raw: Long, t: String): Unit = {
    val l = idx.get(raw)
    if (l != null) { l.remove(t); if (l.isEmpty) idx.remove(raw) }
  }

  def idxRebuild(): Unit = {
    idx.clear()
    m.foreach { case (t, r) => idxAdd(r, t) }
  }
}

case class FreqItemsSketch(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): MGBuffer = new MGBuffer

  /** Classic MG step: known term increments; free slot inserts; a miss on
    * a full map decrements every counter by min(w, current minimum) — as
    * `offset += d` — evicting the minimum counters when w reaches them and
    * inserting the remainder into the freed slot. Identical arithmetic to
    * the textbook loop; when no miss ever fires (vocabulary ≤ capacity)
    * offset stays 0 and counts are exact. */
  private[operators] def offerTo(buf: MGBuffer, term: String, w: Long): Unit =
    buf.m.get(term) match {
      case Some(r) =>
        buf.m.update(term, r + w)
        buf.idxRemove(r, term)
        buf.idxAdd(r + w, term)
      case None if buf.m.size < capacity =>
        val raw = buf.offset + w
        buf.m.update(term, raw)
        buf.idxAdd(raw, term)
      case None =>
        val mn = buf.idx.firstKey() // O(log m), no scan
        val minEff = mn - buf.offset
        if (w < minEff) {
          buf.offset += w // absorbed entirely by the all-around decrement
        } else {
          // decrement all by the minimum, evict the counters that hit 0
          buf.offset += minEff
          val dead = buf.idx.pollFirstEntry().getValue // exactly the min terms
          dead.forEach(t => buf.m.remove(t))
          val rem = w - minEff
          if (rem > 0) {
            buf.m.update(term, buf.offset + rem)
            buf.idxAdd(buf.offset + rem, term)
          }
        }
    }

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val t = child.eval(input)
    if (t != null) offerTo(buf, t.toString, 1L)
    buf
  }

  /** Mergeable-summaries rule: pointwise sum of effective counts, then if
    * over capacity subtract the (capacity+1)-th largest count from all and
    * drop ≤ 0 — both summaries' error bounds add, keeping
    * est ≥ true − n/(m+1). */
  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    if (buf.offset != 0L) { // normalize to effective before pointwise sum
      buf.m.mapValuesInPlace((_, r) => r - buf.offset)
      buf.offset = 0L
    }
    other.m.foreach { case (t, r) =>
      buf.m.update(t, buf.m.getOrElse(t, 0L) + (r - other.offset))
    }
    if (buf.m.size > capacity) {
      val counts = buf.m.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(capacity) // (capacity+1)-th largest
      val dead = buf.m.iterator.collect { case (t, c) if c <= cut => t }.toList
      buf.m.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(buf.m.remove)
    }
    buf.idxRebuild() // counters rewritten wholesale; O(m log m), merges are few
    buf
  }

  override def eval(buf: MGBuffer): Any = {
    val sorted = buf.m.toArray
      .map { case (t, r) => (t, r - buf.offset) }
      .sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  // length-prefixed UTF-8, not writeUTF: writeUTF throws past 64 KB and a
  // "term" can be an arbitrary string expression (a URL, a whole line)
  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m.size)
    buf.m.foreach { case (t, r) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(r - buf.offset)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
    }
    buf.idxRebuild()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "freq_items_sketch"
}

/** Weighted Misra-Gries — the ClickHouse `topKWeighted()` analogue: each
  * arrival counts `weight` instead of 1 (top spenders, top bytes, top
  * token counts). Same state bound, same mergeable-summaries rule (the
  * [[FreqItemsSketch.offer]] step already handles arbitrary positive
  * increments); the error bound generalizes with n = Σ weights. Exact
  * whenever a group's distinct-term count stays ≤ capacity. NULL or
  * non-positive weights contribute nothing. */
case class FreqItemsWeightedSketch(
    term: Expression,
    weight: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  private val inner = FreqItemsSketch(term, capacity)

  override def children: Seq[Expression] = Seq(term, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = inner.dataType

  // update() does weight.eval(..).asInstanceOf[Long]: reject non-LONG
  // weights at analysis time (a SQL caller passing an INT column would
  // otherwise fail mid-execution with ClassCastException), matching
  // BitmapBuildAgg/UniqUpToAgg's analysis-time checks.
  override def checkInputDataTypes(): TypeCheckResult =
    if (term.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING term, got ${term.dataType.sql}")
    else if (weight.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT weight, got ${weight.dataType.sql} (CAST(w AS BIGINT))")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MGBuffer = new MGBuffer

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val t = term.eval(input)
    val w = weight.eval(input)
    if (t != null && w != null) {
      val wl = w.asInstanceOf[Long]
      if (wl > 0L) inner.offerTo(buf, t.toString, wl)
    }
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer =
    inner.merge(buf, other)

  override def eval(buf: MGBuffer): Any = inner.eval(buf)
  override def serialize(buf: MGBuffer): Array[Byte] = inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MGBuffer = inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsWeightedSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsWeightedSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(term = newChildren(0), weight = newChildren(1))
  override def prettyName: String = "freq_items_weighted"
}

object FreqItems {
  /** Top-k frequent items per group by (count DESC, term ASC), exploded as
    * (groupCols..., rnk, term, cnt). State per group is `capacity`
    * counters; shuffle volume O(groups × capacity). */
  def perGroup(df: DataFrame, groupCols: Seq[String], term: Column,
               capacity: Int, k: Int): DataFrame = {
    val agg = GraftSqlBridge.column(
      FreqItemsSketch(GraftSqlBridge.expression(term.cast("string")), capacity)
        .toAggregateExpression())
    df.groupBy(groupCols.map(F.col): _*)
      .agg(agg.as("fi"))
      .select(groupCols.map(F.col) :+
        F.posexplode(F.slice(F.col("fi"), 1, k)).as(Seq("i", "p")): _*)
      .select(groupCols.map(F.col) :+ (F.col("i") + 1).as("rnk")
        :+ F.col("p.term").as("term") :+ F.col("p.cnt").as("cnt"): _*)
  }

  /** Weighted top-k per group (ClickHouse topKWeighted): rank terms by
    * accumulated weight under the same O(groups × capacity) state bound. */
  def perGroupWeighted(df: DataFrame, groupCols: Seq[String], term: Column,
                       weight: Column, capacity: Int, k: Int): DataFrame = {
    val agg = GraftSqlBridge.column(
      FreqItemsWeightedSketch(
        GraftSqlBridge.expression(term.cast("string")),
        GraftSqlBridge.expression(weight.cast("long")), capacity)
        .toAggregateExpression())
    df.groupBy(groupCols.map(F.col): _*)
      .agg(agg.as("fi"))
      .select(groupCols.map(F.col) :+
        F.posexplode(F.slice(F.col("fi"), 1, k)).as(Seq("i", "p")): _*)
      .select(groupCols.map(F.col) :+ (F.col("i") + 1).as("rnk")
        :+ F.col("p.term").as("term") :+ F.col("p.cnt").as("cnt"): _*)
  }

  /** One GLOBAL weighted sketch, emitted in full (all ≤ capacity
    * counters) as (rnk, term, w) rows — the serialization surface
    * TopKSink persists and re-feeds: offering a sketch's emitted
    * (term, weight) rows into a fresh weighted sketch IS the
    * mergeable-summaries rule (pointwise count sum, then trim), so
    * snapshot → re-sketch round-trips preserve the n/(capacity+1)
    * error bound. */
  def globalWeighted(df: DataFrame, term: Column, weight: Column,
                     capacity: Int): DataFrame = {
    val agg = GraftSqlBridge.column(
      FreqItemsWeightedSketch(
        GraftSqlBridge.expression(term.cast("string")),
        GraftSqlBridge.expression(weight.cast("long")), capacity)
        .toAggregateExpression())
    df.agg(agg.as("fi"))
      .select(F.posexplode(F.col("fi")).as(Seq("i", "p")))
      // rnk as LONG at write time: TopKSink.snapSchema declares LongType,
      // so the snapshot must not rely on parquet int->long widening
      .select((F.col("i") + 1).cast("long").as("rnk"),
        F.col("p.term").as("term"), F.col("p.cnt").as("w"))
  }
}
