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

    // Dialect-compat aliases: tiny, exactly-semantics-matched spellings
    // Spark lacks, so catalog SQL written in the common warehouse dialect
    // (and the DuckDB oracle texts) runs verbatim on this engine. Each is
    // a pure rewrite to a builtin expression — codegen'd, no UDF tier.
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Sha2, UnixMicros, UnixSeconds}
    def alias(name: String, build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        build))
    // sha256(x) = lowercase-hex SHA-256, exactly DuckDB's output shape
    // (Spark's sha2 already emits lowercase hex).
    alias("sha256", exprs => Sha2(exprs(0), Literal(256)))
    // epoch_us(ts) = microseconds since epoch (DuckDB spelling of unix_micros).
    alias("epoch_us", exprs => UnixMicros(exprs(0)))
    // epoch(ts) = whole seconds since epoch. DuckDB returns fractional
    // seconds; identical wherever the result feeds integer bucketing
    // (floor(epoch/k) with integer k), which is the catalog's only use.
    alias("epoch", exprs => UnixSeconds(exprs(0)))

    // The broader warehouse-dialect spellings (see DialectCompat's
    // scaladoc for the exact-semantics notes). All pure rewrites to
    // builtin codegen'd expressions.
    import graft.functions.DialectCompat
    import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayFilter, ArrayJoin, ArrayTransform, Explode, GetJsonObject, SortArray, StringInstr, StringSplit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
    alias("len", exprs => DialectCompat.DuckLen(exprs(0)))
    alias("list_filter", exprs => ArrayFilter(exprs(0), exprs(1)))
    alias("list_transform", exprs => ArrayTransform(exprs(0), exprs(1)))
    alias("list_distinct", exprs => ArrayDistinct(exprs(0)))
    alias("array_to_string", exprs => ArrayJoin(exprs(0), exprs(1), None))
    alias("string_split_regex",
      exprs => StringSplit(exprs(0), exprs(1), Literal(-1)))
    alias("unnest", exprs => Explode(exprs(0)))
    alias("range", DialectCompat.rangeCompat)
    alias("quantile_cont", exprs => new Percentile(exprs(0), exprs(1)))
    alias("json_extract_string", exprs => GetJsonObject(exprs(0), exprs(1)))
    alias("strpos", exprs => StringInstr(exprs(0), exprs(1)))
    alias("regexp_replace", DialectCompat.regexpReplaceCompat)
    alias("regexp_extract_all", DialectCompat.regexpExtractAllCompat)
    alias("list_sort", exprs => SortArray(exprs(0), Literal(true)))
    alias("list", exprs =>
      org.apache.spark.sql.catalyst.expressions.aggregate.CollectList(exprs(0)))
    // divide(a, b) = integer division on integral args — the warehouse
    // dialect's named spelling of its parser-level `//` operator (Spark
    // spells it `a div b`; neither operator parses in the other engine,
    // the named form runs in both). Registered as IntegralDivide: the
    // catalog uses it on BIGINT only, where both engines agree exactly
    // (truncating division, all-positive operands in every text).
    alias("divide", exprs =>
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(exprs(0), exprs(1)))
    // list_value(a, b, ...) = array constructor (the warehouse dialect's
    // named spelling of its `[...]` literal, which Spark cannot parse).
    alias("list_value", exprs =>
      org.apache.spark.sql.catalyst.expressions.CreateArray(exprs))
    // list_dot_product: same left-to-right double accumulation as the
    // engine's float_dot kernel — see ListDotProduct's scaladoc for the
    // bit-exactness argument that puts s1/s2 on the parity surface.
    alias("list_dot_product", exprs =>
      graft.functions.ListDotProduct(exprs(0), exprs(1)))
    alias("list_max", exprs =>
      org.apache.spark.sql.catalyst.expressions.ArrayMax(exprs(0)))
  }
}
