package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst vector expressions for the similarity-search hot path.
  *
  * The generic route (`zip_with` + `aggregate`) is a CodegenFallback —
  * it allocates a zipped array and interprets two lambdas per row, which
  * dominates all-pairs scoring (millions of 64-dim dots). This expression
  * generates a tight primitive loop inside whole-stage codegen instead:
  * no allocation, no virtual calls. The accumulation is the identical
  * ordered left fold in double (s = 0; s += x_i*y_i), so results are
  * bit-for-bit the same as the fold the DuckDB oracle runs.
  */
case class FloatVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_vec_dot needs two array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity of two float vectors in a single fused loop
  * (dot and both norms accumulated together — one pass over the data).
  * Exposed mainly as the SQL function `float_vec_cosine`; the all-pairs
  * query paths precompute norms once per vector instead, which is cheaper
  * when each vector participates in many pairs. */
case class FloatVecCosine(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_vec_cosine needs two array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Runtime helper shared by interpreted eval and generated code: scores a
  * vector against every row of a flattened centroid matrix and returns the
  * top-k row indices by cosine, descending (ties → smaller index; the
  * query vector's own norm is a positive per-row constant, so ranking by
  * dot·invNorm equals ranking by cosine). Kept as one static call so the
  * generated code stays a few bytes per row regardless of matrix size. */
object MatOps {
  def topCentroids(v: ArrayData, flat: Array[Float], invNorms: Array[Double],
                   dim: Int, k: Int): ArrayData = {
    val nc = invNorms.length
    val scores = new Array[Double](nc)
    val n = math.min(v.numElements(), dim)
    var c = 0
    while (c < nc) {
      var s = 0.0
      var i = 0
      val off = c * dim
      while (i < n) { s += v.getFloat(i).toDouble * flat(off + i); i += 1 }
      val sc = s * invNorms(c)
      // NaN (Inf×0, NaN inputs) ranks LAST, not first: sanitize to -Inf so
      // a poisoned centroid loses to every valid score
      scores(c) = if (sc != sc) Double.NegativeInfinity else sc
      c += 1
    }
    val kk = math.min(k, nc)
    val out = new Array[Int](kk)
    val used = new Array[Boolean](nc)
    var j = 0
    while (j < kk) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var i = 0
      while (i < nc) {
        // `>` never admits NaN scores; keep the smallest unused index as
        // a deterministic fallback so a NaN-poisoned vector degrades to
        // index order instead of crashing on used(-1)
        if (!used(i) && (best < 0 || scores(i) > bestS)) { best = i; bestS = scores(i) }
        i += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** LSH bucket per table: bit b of bucket t set iff
    * dot(v, plane[t·bpt+b]) > 0 (ascending-index fold, same as
    * FloatVecDot). */
  def signBuckets(v: ArrayData, flat: Array[Float], dim: Int, bpt: Int): ArrayData = {
    val nPlanes = if (dim == 0) 0 else flat.length / dim
    val out = new Array[Int](nPlanes / bpt)
    val n = math.min(v.numElements(), dim)
    var p = 0
    while (p < nPlanes) {
      var s = 0.0
      var i = 0
      val off = p * dim
      while (i < n) { s += v.getFloat(i).toDouble * flat(off + i); i += 1 }
      if (s > 0.0) out(p / bpt) |= 1 << (p % bpt)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Plan-time validation of the constant matrix literals: flattening calls
  * `getArray(i).toFloatArray()`, which NPEs on a null row (the element
  * type admits nulls), and ragged rows would be silently zero-padded to
  * the longest row — both are caller bugs that must fail analysis with a
  * clear message, not eval time. */
private[functions] object MatValidation {
  /** None if rectangular and null-free, Some(error message) otherwise. */
  def check(m: ArrayData, what: String): Option[String] = {
    var d = -1
    var i = 0
    while (i < m.numElements()) {
      if (m.isNullAt(i)) return Some(s"$what must not contain null rows (row $i is null)")
      val r = m.getArray(i)
      var j = 0
      while (j < r.numElements()) {
        if (r.isNullAt(j)) return Some(
          s"$what must not contain null elements (row $i, element $j is null)")
        j += 1
      }
      if (d < 0) d = r.numElements()
      else if (r.numElements() != d) return Some(
        s"$what rows must all have equal length (row 0 has $d, row $i has ${r.numElements()})")
      i += 1
    }
    None
  }
}

/** Random-hyperplane LSH bucket signatures: planes is a constant matrix of
  * (nTables × bitsPerTable) rows; bucket t's bit b is set when
  * dot(vec, plane[t·bpt + b]) > 0 (the dot is the same ascending-index
  * fold as FloatVecDot, so signs match the per-plane expression form).
  * Returns array<int> of nTables buckets. Replaces nTables×bitsPerTable
  * unrolled literal-array dot columns with one reference object + one
  * static call — plan size independent of the plane count. */
case class FloatMatSignBuckets(vec: Expression, mat: Expression, bitsPerTable: Expression)
  extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = mat
  override def third: Expression = bitsPerTable

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val matOk = mat.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _ => false
    }
    if (!vecOk || !matOk || bitsPerTable.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"float_mat_sign_buckets needs (array<float>, array<array<float>>, int), " +
          s"got (${vec.dataType}, ${mat.dataType}, ${bitsPerTable.dataType})")
    else if (!mat.foldable || !bitsPerTable.foldable)
      TypeCheckResult.TypeCheckFailure(
        "float_mat_sign_buckets needs constant (foldable) planes and bitsPerTable")
    else {
      val bv = bitsPerTable.eval(null)
      val mv = mat.eval(null)
      if (bv == null || mv == null)
        TypeCheckResult.TypeCheckFailure("planes and bitsPerTable must be non-null")
      else {
        val b = bv.asInstanceOf[Int]
        val nPlanes = mv.asInstanceOf[ArrayData].numElements()
        if (b < 1 || b > 32)
          TypeCheckResult.TypeCheckFailure(s"bitsPerTable must be in [1, 32], got $b")
        else if (nPlanes % b != 0)
          TypeCheckResult.TypeCheckFailure(
            s"plane count ($nPlanes) must be a multiple of bitsPerTable ($b)")
        else MatValidation.check(mv.asInstanceOf[ArrayData], "planes matrix")
          .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
      }
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "float_mat_sign_buckets"

  @transient private lazy val (flat: Array[Float], dim: Int) = {
    val m = mat.eval(null).asInstanceOf[ArrayData]
    val rows = Array.tabulate(m.numElements())(i => m.getArray(i).toFloatArray())
    val d = if (rows.isEmpty) 0 else rows.map(_.length).max
    val f = new Array[Float](rows.length * d)
    rows.zipWithIndex.foreach { case (r, i) => System.arraycopy(r, 0, f, i * d, r.length) }
    (f, d)
  }
  @transient private lazy val bpt: Int = bitsPerTable.eval(null).asInstanceOf[Int]

  override def nullSafeEval(v: Any, m: Any, b: Any): Any =
    MatOps.signBuckets(v.asInstanceOf[ArrayData], flat, dim, bpt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("planesFlat", flat, "float[]")
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"${ev.value} = graft.functions.MatOps.signBuckets($v, $flatRef, $dim, $bpt);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, mat = newSecond, bitsPerTable = newThird)
}

/** Top-k nearest centroid *indices* for a float vector against a constant
  * centroid matrix (array<array<float>> literal), by cosine descending.
  *
  * The IVF assign/probe path previously unrolled one literal-array cosine
  * struct per centroid — 16 64-float literals per row made the generated
  * source huge (slow Janino compiles, one distinct class per trained
  * matrix, never warm). Here the matrix is ONE reference object attached
  * to the generated class; per-row code is a single static call into
  * [[MatOps]], so plan size is independent of centroid count and the
  * compiled class is reused across any matrix of the same shape. */
case class FloatMatTopCentroids(vec: Expression, mat: Expression, k: Expression)
  extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = mat
  override def third: Expression = k

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val matOk = mat.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _ => false
    }
    if (!vecOk || !matOk || k.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"float_mat_top_centroids needs (array<float>, array<array<float>>, int), " +
          s"got (${vec.dataType}, ${mat.dataType}, ${k.dataType})")
    else if (!mat.foldable || !k.foldable)
      TypeCheckResult.TypeCheckFailure(
        "float_mat_top_centroids needs constant (foldable) matrix and k")
    else {
      val (kv, mv) = (k.eval(null), mat.eval(null))
      if (kv == null || kv.asInstanceOf[Int] < 1 || mv == null)
        TypeCheckResult.TypeCheckFailure("matrix must be non-null and k >= 1")
      else MatValidation.check(mv.asInstanceOf[ArrayData], "centroid matrix")
        .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "float_mat_top_centroids"

  @transient private lazy val (flat: Array[Float], invNorms: Array[Double], dim: Int) = {
    val m = mat.eval(null).asInstanceOf[ArrayData]
    val rows = Array.tabulate(m.numElements())(i => m.getArray(i).toFloatArray())
    val d = if (rows.isEmpty) 0 else rows.map(_.length).max
    val f = new Array[Float](rows.length * d)
    rows.zipWithIndex.foreach { case (r, i) => System.arraycopy(r, 0, f, i * d, r.length) }
    val inv = rows.map { r =>
      val nrm = math.sqrt(r.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
      if (nrm == 0.0) 0.0 else 1.0 / nrm
    }
    (f, inv, d)
  }
  @transient private lazy val topK: Int = k.eval(null).asInstanceOf[Int]

  override def nullSafeEval(v: Any, m: Any, kk: Any): Any =
    MatOps.topCentroids(v.asInstanceOf[ArrayData], flat, invNorms, dim, topK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("matFlat", flat, "float[]")
    val invRef = ctx.addReferenceObj("matInvNorms", invNorms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"${ev.value} = graft.functions.MatOps.topCentroids($v, $flatRef, $invRef, $dim, $topK);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, mat = newSecond, k = newThird)
}

object VectorFunctions {
  /** Ordered-fold dot product of two float vectors, in double (codegen'd). */
  def floatVecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      FloatVecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Fused single-pass cosine similarity (codegen'd). */
  def floatVecCosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      FloatVecCosine(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Top-k nearest rows of a constant centroid matrix, by cosine desc. */
  def floatMatTopCentroids(vec: Column, mat: Column, k: Column): Column =
    GraftSqlBridge.column(
      FloatMatTopCentroids(GraftSqlBridge.expression(vec),
        GraftSqlBridge.expression(mat), GraftSqlBridge.expression(k)))

  /** Random-hyperplane LSH bucket per table (codegen'd). */
  def floatMatSignBuckets(vec: Column, planes: Column, bitsPerTable: Column): Column =
    GraftSqlBridge.column(
      FloatMatSignBuckets(GraftSqlBridge.expression(vec),
        GraftSqlBridge.expression(planes), GraftSqlBridge.expression(bitsPerTable)))
}
