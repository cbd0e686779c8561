package graft

import graft.functions.{FloatDotProduct, ShingleHashArray, SortedLongIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library packaging for the engine's custom expressions: install via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  * Injected functions are session-bound builtins — available to SQL and
  * `call_function` alike, on every executor, with no per-query
  * registration. `VectorFunctions.register` remains as the programmatic
  * fallback for sessions created without the conf. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName,
        "sorted_intersect_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedLongIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashArray].getName, "shingle_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHashArray(exprs(0))))
  }
}
