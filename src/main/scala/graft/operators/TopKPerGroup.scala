package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

/** Bounded-heap top-k per group as a custom Catalyst aggregate.
  *
  * The idiomatic `row_number().over(Window.partitionBy(...))` top-N sorts
  * EVERY row of every group; at 100 TB that is a full shuffle + sort of
  * the fact table to keep k rows per group. This TypedImperativeAggregate
  * keeps a k-bounded heap instead, and because it is an Aggregate it gets
  * map-side partial aggregation for free: each input partition sends at
  * most k entries per group into the shuffle, so shuffle volume is
  * O(groups × k), not O(rows). Heaps merge associatively, so the result
  * is identical under any partitioning.
  *
  * Ordering: strongest = (score DESC, id ASC) — same deterministic
  * tie-break as the window formulation it replaces.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    distinct: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  /** max-heap by WEAKNESS: head is the weakest kept entry (lowest score,
    * then largest id), i.e. the eviction candidate. */
  private val weakest: Ordering[(Double, Long)] =
    Ordering.by((t: (Double, Long)) => (-t._1, t._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(weakest)

  /** distinct = top-k over the DISTINCT (score, id) multiset — for
    * streams whose duplicates are identical tuples (an LSH candidate
    * pair co-bucketed in several tables scores the same cs every
    * time), so the dedup happens INSIDE the bounded heap instead of a
    * full dropDuplicates shuffle ahead of it. Exactness: a tuple in
    * the heap blocks its copies; a tuple that never entered (or was
    * evicted) is weaker than every kept entry, so its copies lose the
    * same comparison. O(k) membership scan per offer — k is small by
    * contract. */
  private def offer(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit =
    if (distinct && buf.exists(_ == e)) ()
    else if (buf.size < k) buf.enqueue(e)
    else if (weakest.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    // ascending under `weakest` = strongest first (it sorts by (-score, id))
    new GenericArrayData(buf.toArray.sorted(weakest)
      .map { case (s, i) => InternalRow(s, i) })

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_pairs"
}

object TopK {
  /** Top-k rows per group by (score DESC, id ASC), returned exploded as
    * (groupCols..., rnk, score, id). Shuffle volume is O(groups × k).
    *
    * `distinct` dedups the (score, id) TUPLE inside the bounded heap,
    * not the id: it replaces a dropDuplicates(group, id) ONLY when
    * duplicate candidates score bit-identically (true for LSH
    * candidates — the same pair co-bucketed in several tables computes
    * the same cs). A caller whose duplicates carry per-copy score
    * jitter would keep one id in two heap slots — dedup upstream
    * instead (r11 advice #4). */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               score: Column, id: Column, k: Int,
               distinct: Boolean = false): DataFrame = {
    val agg = GraftSqlBridge.column(
      TopKPairs(GraftSqlBridge.expression(score.cast("double")),
        GraftSqlBridge.expression(id.cast("long")), k,
        distinct).toAggregateExpression())
    df.groupBy(groupCols.map(F.col): _*)
      .agg(agg.as("topk"))
      .select(groupCols.map(F.col) :+ F.posexplode(F.col("topk")).as(Seq("i", "p")): _*)
      .select(groupCols.map(F.col) :+ (F.col("i") + 1).as("rnk")
        :+ F.col("p.score").as("score") :+ F.col("p.id").as("id"): _*)
  }
}
