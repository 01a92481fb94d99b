package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._

/** ClickHouse `uniqUpTo(N)`: exact distinct count while it is ≤ N,
  * the sentinel N+1 once it exceeds N.
  *
  * The point is the state bound: "are there more than N distinct?" needs
  * at most N+1 remembered values per group — NOT the full distinct set.
  * The buffer stops absorbing the moment it reaches N+1 elements
  * (saturation is monotone and commutes with merge: once any partial
  * saturates, every merge result saturates), so per-group state is
  * O(N) at any data scale where countDistinct's is O(distinct).
  * Typical use: "flag groups with more than N distinct users" over
  * billions of groups.
  */
case class UniqUpToAgg(
    child: Expression,
    n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Long]] {

  require(n > 0, "n must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"uniq_up_to requires BIGINT ids, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashSet[Long] = mutable.HashSet.empty

  override def update(buf: mutable.HashSet[Long], input: InternalRow): mutable.HashSet[Long] = {
    if (buf.size <= n) { // saturated at n+1: stop absorbing
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long]): Unit
    }
    buf
  }

  override def merge(buf: mutable.HashSet[Long],
                     other: mutable.HashSet[Long]): mutable.HashSet[Long] = {
    val it = other.iterator
    while (buf.size <= n && it.hasNext) buf.add(it.next()): Unit
    buf
  }

  override def eval(buf: mutable.HashSet[Long]): Any = buf.size.toLong

  override def serialize(buf: mutable.HashSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val k = in.readInt()
    (0 until k).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpToAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqUpToAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = s"uniq_up_to($n)"
}

object UniqUpTo {
  /** min(exact distinct count of `ids`, n+1) with O(n) state per group. */
  def agg(ids: Column, n: Int): Column =
    GraftSqlBridge.column(
      UniqUpToAgg(GraftSqlBridge.expression(ids), n).toAggregateExpression())
}
