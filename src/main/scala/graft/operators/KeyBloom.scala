package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Per-segment KEY Bloom filter — the graft-kv connector's skip index
  * (the ClickHouse `bloom_filter` skip-index analogue for point/IN key
  * probes that survive the range zone map: a missing key skips the
  * whole segment without opening it).
  *
  * Determinism: FNV-1a over the key bytes, splitmix64-finalized twice
  * for Kirsch–Mitzenmacher double hashing (bit i = h1 + i·h2 mod m) —
  * no engine/session randomness, and the bit array ORs
  * partition/merge-order invariantly, so the same store always writes
  * the same sidecar bytes. False positives only ever cost an extra
  * segment read (filters are residual); false negatives are impossible
  * by construction.
  */
object KeyBloom {

  /** Default bits per segment: 128 Kbit = 16 KB — ≈1% fpp to ~13k
    * distinct keys/segment with 7 probes, degrading gracefully (never
    * incorrectly) past that. A write path expecting bigger segments
    * passes a bigger m. */
  val DefaultBits: Int = 1 << 17
  val DefaultHashes: Int = 7

  private def mix(v0: Long): Long = {
    var z = v0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def fnv(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Set the key's `hashes` bits in `bits` (m = bits.length·64). */
  def add(bits: Array[Long], hashes: Int, key: Array[Byte]): Unit = {
    val base = fnv(key)
    val h1 = mix(base)
    val h2 = mix(base ^ 0x5851f42d4c957f2dL) | 1L // odd → full period
    val m = bits.length.toLong * 64L
    var i = 0
    while (i < hashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63L))
      i += 1
    }
  }

  /** Definitive-absence test: false ⇒ the key is NOT in the segment. */
  def mightContain(bits: Array[Long], hashes: Int, key: Array[Byte]): Boolean = {
    val base = fnv(key)
    val h1 = mix(base)
    val h2 = mix(base ^ 0x5851f42d4c957f2dL) | 1L
    val m = bits.length.toLong * 64L
    var i = 0
    while (i < hashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Serialized form: [hashes:int][nWords:int][words...] big-endian. */
  def serialize(bits: Array[Long], hashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + bits.length * 8)
    bb.putInt(hashes).putInt(bits.length)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Array[Long], Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val hashes = bb.getInt
    val n = bb.getInt
    val bits = Array.fill(n)(bb.getLong)
    (bits, hashes)
  }

  /** Bloom-building aggregate over BINARY keys → serialized filter. */
  def agg(keys: Column, mBits: Int = DefaultBits,
          hashes: Int = DefaultHashes): Column =
    GraftSqlBridge.column(
      KeyBloomAgg(GraftSqlBridge.expression(keys), mBits, hashes)
        .toAggregateExpression())
}

case class KeyBloomAgg(
    child: Expression,
    mBits: Int,
    hashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(mBits % 64 == 0 && mBits > 0, "bloom bits must be a positive multiple of 64")
  require(hashes > 0, "bloom needs at least one probe")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"key_bloom requires BINARY keys, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) KeyBloom.add(buf, hashes, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = KeyBloom.serialize(buf, hashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    KeyBloom.serialize(buf, hashes)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    KeyBloom.deserialize(bytes)._1

  override def withNewMutableAggBufferOffset(newOffset: Int): KeyBloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KeyBloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = s"key_bloom($mBits,$hashes)"
}
