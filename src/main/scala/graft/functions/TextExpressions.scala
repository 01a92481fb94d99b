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
    else TypeCheckResult.TypeCheckSuccess

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

object TextFunctions {
  /** One-pass rolling-window MinHash sketch (codegen'd). */
  def rollingMinHash(str: Column, width: Int, k: Int): Column =
    GraftSqlBridge.column(RollingMinHash(GraftSqlBridge.expression(str),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(width)),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(k))))
}
