package graft

import org.scalatest.funsuite.AnyFunSuite

/** The catalog's oracle SQL is written ONCE in the shared Spark∩DuckDB
  * dialect — with `GraftExtensions`' dialect-compat spellings installed
  * (sha256, len-on-arrays, list_filter/list_transform, range, unnest,
  * epoch_us, quantile_cont, ... — see `DialectCompat`), 124 of the
  * oracle texts run VERBATIM on Spark SQL. This spec executes each via
  * spark.sql over the temp-view catalog and requires row-for-row
  * equality with the DataFrame program: one query text, three engines
  * (Spark DataFrame, Spark SQL, DuckDB), one result.
  *
  * `spark.sql.parser.escapedStringLiterals=true` is part of the parity
  * profile: the warehouse dialect treats backslashes in string literals
  * as raw regex characters ('\s+'), where Spark's default parser would
  * consume them as escapes — a silent regex rewrite, not an error.
  *
  * The remaining texts use constructs with no shared spelling or
  * shared SEMANTICS to bridge: 1-based array subscripts and `a[i:j]`
  * slices (t4/t12/t13/t14, d3/d4/d9/d10/pipe2), parallel-unnest zipping (s5),
  * parallel-unnest zipping (s8, like s5), recursive
  * CTEs with UNION dedup (d7), anonymous-struct aggregation orders with
  * possible value ties that arg-min/max cannot tie-break portably
  * (s11/s12's min(struct(d, cell))), IGNORE NULLS inside the call parens
  * (e7, olap_gap_fill), string-unit date_diff parsed before
  * the function registry can see it (e9, f_date, olap_rolling_range), length-free VARCHAR casts and fmt-style format
  * (f_scalar), and BLOB casts (m1/m3/m4/m5). Their cross-engine check is
  * the driver's DuckDB gate.
  *
  * Round-7 bridges: `divide(a, b)` (the named spelling of integer
  * division, IntegralDivide on Spark) moved g1/g5/w10/pipe3 onto the
  * surface; `max_by` with a unique ordering key moved w11; a
  * fixed-width lpad sort-key encoding of the (us, eid, ch) struct order
  * moved e14; `list_value` (the named array constructor) moved e4; and
  * `list_dot_product` (registered on Spark with the engine kernel's
  * exact left-to-right double accumulation) + `list_max` +
  * `list_transform(..., CAST AS DOUBLE)` moved s1/s2/s7.
  */
class SqlParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // The list lives in main (SparkEntry.sqlPortable): ThriftServe serves
  // the same surface over the JDBC wire.
  private val portable: Seq[String] = SparkEntry.sqlPortable

  test(s"parity surface covers ${portable.size} oracle texts") {
    assert(portable.size >= 90, s"parity surface shrank to ${portable.size}")
    assert(portable.toSet.subsetOf(SparkEntry.oracleSql.keySet))
  }

  portable.foreach { name =>
    test(s"$name: oracle SQL runs verbatim on Spark SQL with identical results") {
      Tables(spark, dir).registerAll()
      val prev = spark.conf.get("spark.sql.parser.escapedStringLiterals")
      spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
      try {
        val viaSql = spark.sql(SparkEntry.oracleSql(name)).collect().toSeq
        val viaDf = SparkEntry.queries(name)(spark, dir).collect().toSeq
        assert(viaSql.map(_.toSeq) == viaDf.map(_.toSeq),
          s"$name: Spark SQL result differs from DataFrame result")
      } finally spark.conf.set("spark.sql.parser.escapedStringLiterals", prev)
    }
  }
}
