package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.roaringbitmap.longlong.Roaring64Bitmap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._

/** Exact distinct-id sets as Roaring bitmaps — the ClickHouse
  * `groupBitmap` / `groupBitmapAnd` family.
  *
  * `collect_set` keeps one JVM object per id (O(distinct × 8B+overhead)
  * per group, all of it shuffled); a Roaring bitmap stores the same set
  * in compressed runs/containers, merges by container OR, and — unlike a
  * HyperLogLog — is EXACT and supports set algebra (AND/OR/ANDNOT)
  * between groups after aggregation. That is what makes audience-overlap
  * queries ("users who did X and Y") one aggregate pass + a tiny
  * post-join instead of a distinct self-join at 100 TB.
  *
  * The aggregate is a TypedImperativeAggregate, so Spark gives it
  * map-side partial aggregation: each task ships one serialized bitmap
  * per group, not one row per (group, id).
  */
case class BitmapBuildAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_build requires BIGINT ids, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buf: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.addLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    buf.or(other)
    buf
  }

  override def eval(buf: Roaring64Bitmap): Any = serialize(buf)

  override def serialize(buf: Roaring64Bitmap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.serialize(out)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "bitmap_build"
}

/** Cardinality of a serialized bitmap. Scalar, runs on post-aggregation
  * rows (one per group) — eval-only is fine off the codegen hot path. */
case class BitmapCardinality(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_cardinality requires a serialized bitmap (BINARY), got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    BitmapDistinct.fromBytes(input.asInstanceOf[Array[Byte]]).getLongCardinality

  override protected def withNewChildInternal(newChild: Expression): BitmapCardinality =
    copy(child = newChild)
  override def prettyName: String = "bitmap_cardinality"
}

/** |A ∩ B| of two serialized bitmaps (ClickHouse groupBitmapAnd shape). */
case class BitmapAndCardinality(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bitmap_and_cardinality requires two serialized bitmaps (BINARY)")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val bm = BitmapDistinct.fromBytes(a.asInstanceOf[Array[Byte]])
    bm.and(BitmapDistinct.fromBytes(b.asInstanceOf[Array[Byte]]))
    bm.getLongCardinality
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndCardinality =
    copy(left = l, right = r)
  override def prettyName: String = "bitmap_and_cardinality"
}

/** |A \ B| — ClickHouse `bitmapAndnotCardinality`: members of A that are
  * NOT in B (the "did X but never Y" audience). Same post-aggregation
  * contract as BitmapAndCardinality: runs on one row per group. */
case class BitmapAndNotCardinality(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bitmap_andnot_cardinality requires two serialized bitmaps (BINARY)")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val bm = BitmapDistinct.fromBytes(a.asInstanceOf[Array[Byte]])
    bm.andNot(BitmapDistinct.fromBytes(b.asInstanceOf[Array[Byte]]))
    bm.getLongCardinality
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndNotCardinality =
    copy(left = l, right = r)
  override def prettyName: String = "bitmap_andnot_cardinality"
}

/** A \ B as a SERIALIZED BITMAP — ClickHouse `bitmapAndnot` (the
  * value-returning sibling of BitmapAndNotCardinality): composes with
  * further bitmap algebra, e.g. the maintained retention read's
  * "first-seen this week" = week \ (OR of earlier weeks). */
case class BitmapAndNot(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bitmap_andnot requires two serialized bitmaps (BINARY)")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val bm = BitmapDistinct.fromBytes(a.asInstanceOf[Array[Byte]])
    bm.andNot(BitmapDistinct.fromBytes(b.asInstanceOf[Array[Byte]]))
    val bos = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndNot =
    copy(left = l, right = r)
  override def prettyName: String = "bitmap_andnot"
}

/** |A △ B| — ClickHouse `bitmapXorCardinality`: symmetric difference
  * (members in exactly one of the two audiences). */
case class BitmapXorCardinality(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bitmap_xor_cardinality requires two serialized bitmaps (BINARY)")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val bm = BitmapDistinct.fromBytes(a.asInstanceOf[Array[Byte]])
    bm.xor(BitmapDistinct.fromBytes(b.asInstanceOf[Array[Byte]]))
    bm.getLongCardinality
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapXorCardinality =
    copy(left = l, right = r)
  override def prettyName: String = "bitmap_xor_cardinality"
}

/** OR-merge of already-serialized bitmaps — the ClickHouse
  * `groupBitmapMergeState` / `-Merge` combinator: re-aggregate
  * pre-aggregated states (e.g. per-day bitmaps rolled up to per-type)
  * without touching the fact table again. This is what makes bitmap
  * materialized views composable: any partition of the data into
  * pre-aggregation groups merges to the identical exact set. */
case class BitmapOrAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_or requires serialized bitmaps (BINARY), got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buf: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.or(BitmapDistinct.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    buf.or(other)
    buf
  }

  override def eval(buf: Roaring64Bitmap): Any = serialize(buf)

  override def serialize(buf: Roaring64Bitmap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.serialize(out)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap =
    BitmapDistinct.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "bitmap_or"
}

object BitmapDistinct {
  private[operators] def fromBytes(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  /** Aggregate: the serialized bitmap of `ids` (a BIGINT column). */
  def buildAgg(ids: Column): Column =
    GraftSqlBridge.column(
      BitmapBuildAgg(GraftSqlBridge.expression(ids)).toAggregateExpression())

  def cardinality(bm: Column): Column =
    GraftSqlBridge.column(BitmapCardinality(GraftSqlBridge.expression(bm)))

  def andCardinality(a: Column, b: Column): Column =
    GraftSqlBridge.column(BitmapAndCardinality(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def andNotCardinality(a: Column, b: Column): Column =
    GraftSqlBridge.column(BitmapAndNotCardinality(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** A \ B as a serialized bitmap (composable set algebra). */
  def andNot(a: Column, b: Column): Column =
    GraftSqlBridge.column(BitmapAndNot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def xorCardinality(a: Column, b: Column): Column =
    GraftSqlBridge.column(BitmapXorCardinality(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Aggregate: OR-merge of already-serialized bitmap states. */
  def orAgg(bitmaps: Column): Column =
    GraftSqlBridge.column(
      BitmapOrAgg(GraftSqlBridge.expression(bitmaps)).toAggregateExpression())
}
