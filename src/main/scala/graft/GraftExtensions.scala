package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatMatSignBuckets, FloatMatTopCentroids, FloatVecCosine, FloatVecDot, RollingMinHash, WordShingleMinHash, WordSimHash}

/** Spark session extension registering graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("... float_vec_dot(a, b)")`
  * works cluster-wide:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions        // via config, or
  *   SparkSession.builder().withExtensions(new GraftExtensions) // in code
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    (new FunctionIdentifier("float_vec_cosine"),
      new ExpressionInfo(classOf[FloatVecCosine].getName, "float_vec_cosine"),
      (args: Seq[Expression]) => FloatVecCosine(args(0), args(1))),
    (new FunctionIdentifier("float_mat_top_centroids"),
      new ExpressionInfo(classOf[FloatMatTopCentroids].getName, "float_mat_top_centroids"),
      (args: Seq[Expression]) => FloatMatTopCentroids(args(0), args(1), args(2))),
    (new FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (args: Seq[Expression]) => RollingMinHash(args(0), args(1), args(2))),
    (new FunctionIdentifier("word_shingle_min_hash"),
      new ExpressionInfo(classOf[WordShingleMinHash].getName, "word_shingle_min_hash"),
      (args: Seq[Expression]) => WordShingleMinHash(args(0), args(1), args(2))),
    (new FunctionIdentifier("word_sim_hash"),
      new ExpressionInfo(classOf[WordSimHash].getName, "word_sim_hash"),
      (args: Seq[Expression]) => WordSimHash(args(0))),
    (new FunctionIdentifier("float_mat_sign_buckets"),
      new ExpressionInfo(classOf[FloatMatSignBuckets].getName, "float_mat_sign_buckets"),
      (args: Seq[Expression]) => FloatMatSignBuckets(args(0), args(1), args(2))))

  /** Register on an already-built session (e.g. a REPL). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graftbridge.GraftSqlBridge
        .registerFunction(spark, id, info, builder)
    }
}
