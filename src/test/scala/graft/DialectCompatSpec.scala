package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exact-semantics pins for the dialect-compat spellings GraftExtensions
  * injects (DialectCompat): each alias must match the warehouse dialect
  * bit-for-bit on its edge cases, not just on the happy path. */
class DialectCompatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(sql: String) = spark.sql(s"SELECT $sql AS v").head()

  test("len dispatches on type: char length for strings, size for arrays") {
    assert(one("len('héllo')").getInt(0) == 5)
    assert(one("len(array(1, 2, 3))").getInt(0) == 3)
    assert(one("len(array())").getInt(0) == 0)
    assert(one("len(CAST(NULL AS STRING))").isNullAt(0))
  }

  test("range is half-open and EMPTY when stop <= start (never counts down)") {
    assert(one("range(2, 5)").getSeq[Long](0) == Seq(2L, 3L, 4L))
    assert(one("range(1, 1)").getSeq[Long](0) == Seq.empty)
    assert(one("range(1, 0)").getSeq[Long](0) == Seq.empty)
    assert(one("range(3)").getSeq[Long](0) == Seq(0L, 1L, 2L))
    // The trap the alias exists to avoid: bare sequence counts DOWNWARD.
    assert(one("sequence(1, 0)").getSeq[Long](0) == Seq(1L, 0L))
  }

  test("regexp_replace accepts the 'g' flag as Spark's (global) default") {
    assert(one("regexp_replace('a1b2', '[0-9]', '_', 'g')").getString(0) == "a_b_")
    assert(one("regexp_replace('a1b2', '[0-9]', '_')").getString(0) == "a_b_")
    // 4th-arg integer keeps Spark's position semantics.
    assert(one("regexp_replace('a1b2', '[0-9]', '_', 3)").getString(0) == "a1b_")
  }

  test("regexp_replace REJECTS non-'g' string flags at analysis (no silent NULL)") {
    // Without the explicit string match, 'i' would fall through to the
    // position branch, implicitly cast to INT (null), and the whole
    // expression would silently return NULL at runtime.
    Seq("i", "m", "gi").foreach { f =>
      val e = intercept[Exception] {
        one(s"regexp_replace('a1b2', '[0-9]', '_', '$f')")
      }
      assert(e.getMessage.contains("unsupported regex flags"),
        s"flag '$f' must be rejected at analysis, got: ${e.getMessage}")
    }
  }

  test("epoch truncates to whole seconds — INTENTIONAL divergence from fractional") {
    // DuckDB's epoch() returns DOUBLE fractional seconds; this alias is
    // UnixSeconds (BIGINT whole seconds). The truncation is safe exactly
    // where the catalog uses it — integer bucketing floor(epoch/k) — and
    // this pin documents the sub-second behaviour so a future oracle
    // text over sub-second timestamps can't assume fractional parity.
    assert(one("epoch(TIMESTAMP '1970-01-01 00:00:01.750')").getLong(0) == 1L)
    assert(one("epoch(TIMESTAMP '1969-12-31 23:59:59.250')").getLong(0) == -1L)
    // Bucketing at any whole-second granularity is unaffected:
    assert(one("CAST(floor(epoch(TIMESTAMP '1970-01-01 00:00:59.9') / 60) AS BIGINT)")
      .getLong(0) == 0L)
  }

  test("regexp_extract_all 2-arg returns full matches (group 0)") {
    assert(one("regexp_extract_all('a1 b22', '[0-9]+')").getSeq[String](0)
      == Seq("1", "22"))
  }

  test("sha256 / epoch_us / epoch / strpos match the warehouse spellings") {
    // sha256('') — the RFC test vector, lowercase hex.
    assert(one("sha256('')").getString(0)
      == "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
    assert(one("epoch_us(TIMESTAMP '1970-01-01 00:00:01')").getLong(0) == 1000000L)
    assert(one("epoch(TIMESTAMP '1970-01-01 00:05:00')").getLong(0) == 300L)
    assert(one("strpos('hello spark', 'spark')").getInt(0) == 7)
    assert(one("strpos('hello', 'zz')").getInt(0) == 0)
  }

  test("string_split_regex keeps trailing empties; '' yields ['']") {
    assert(one("string_split_regex('a  b ', '\\\\s+')").getSeq[String](0)
      == Seq("a", "b", ""))
    assert(one("string_split_regex('', '\\\\s+')").getSeq[String](0) == Seq(""))
  }

  test("list aliases: filter/transform/distinct/sort/to_string/collect") {
    assert(one("list_filter(array(1, 2, 3), x -> x > 1)").getSeq[Int](0) == Seq(2, 3))
    assert(one("list_transform(array(1, 2), x -> x * 10)").getSeq[Int](0) == Seq(10, 20))
    assert(one("list_distinct(array(1, 1, 2))").getSeq[Int](0) == Seq(1, 2))
    assert(one("list_sort(array(3, 1, 2))").getSeq[Int](0) == Seq(1, 2, 3))
    assert(one("array_to_string(array('a', 'b'), ',')").getString(0) == "a,b")
    assert(spark.sql("SELECT array_to_string(list_sort(list(x)), ',') AS v " +
      "FROM VALUES (2), (1) t(x)").head().getString(0) == "1,2")
  }

  test("quantile_cont equals the exact percentile interpolation") {
    assert(spark.sql("SELECT quantile_cont(x, 0.25) AS v FROM VALUES (1.0), (2.0)," +
      " (3.0), (4.0), (5.0) t(x)").head().getDouble(0) == 2.0)
  }

  test("json_extract_string follows $.path extraction") {
    assert(one("""json_extract_string('{"k": "42"}', '$.k')""").getString(0) == "42")
  }

  test("divide is integer division on BIGINT (the warehouse `//` named form)") {
    assert(one("divide(7, 2)").getLong(0) == 3L)
    assert(one("divide(CAST(1000000000 AS BIGINT), 3)").getLong(0) == 333333333L)
    // Truncation toward zero on negatives — matches the oracle engine
    // (both verified on negatives; catalog operands are all-positive).
    assert(one("divide(-7, 2)").getLong(0) == -3L)
  }

  test("list_slice is 1-based INCLUSIVE [i..j]: clamps, empty past the end") {
    assert(one("list_slice(array(1, 2, 3, 4, 5), 2, 4)").getSeq[Int](0) == Seq(2, 3, 4))
    assert(one("list_slice(array(1, 2), 1, 5)").getSeq[Int](0) == Seq(1, 2))
    assert(one("list_slice(array(1, 2, 3), 4, 5)").getSeq[Int](0) == Seq())
  }

  test("list_extract is 1-BASED (the raw [] subscript is 0-based on Spark — never shared)") {
    assert(one("list_extract(array(10, 20, 30), 1)").getInt(0) == 10)
    assert(one("list_extract(array(10, 20, 30), CAST(3 AS BIGINT))").getInt(0) == 30)
  }

  test("list_value / list_min / list_sum / list_contains / list_reverse match the named list kernel") {
    assert(one("list_value(3, 1, 2)").getSeq[Int](0) == Seq(3, 1, 2))
    assert(one("list_min(array(3, 1, 2))").getInt(0) == 1)
    assert(one("list_sum(array(CAST(1 AS BIGINT), 2, 3))").getLong(0) == 6L)
    assert(one("list_contains(array(1, 2), 2)").getBoolean(0))
    assert(one("list_reverse(array(1, 2, 3))").getSeq[Int](0) == Seq(3, 2, 1))
  }

  test("1-arg encode is UTF-8 string->binary; 2-arg keeps Spark's builtin") {
    assert(one("octet_length(encode('héllo'))").getInt(0) == 6)
    assert(one("octet_length(encode('héllo', 'UTF-8'))").getInt(0) == 6)
    assert(one("octet_length(encode('abc', 'UTF-16BE'))").getInt(0) == 6)
  }

  test("xor is bitwise (the ^ operator means POWER in the warehouse dialect)") {
    assert(one("xor(12, 10)").getInt(0) == 6)
    assert(one("xor(CAST(1 AS BIGINT) << 40, 1)").getLong(0) == (1L << 40) + 1)
  }

  test("list_dot_product: double and float arrays, bit-identical to float_dot's accumulation") {
    val viaDouble = one(
      "list_dot_product(list_transform(array(CAST(0.1 AS FLOAT), CAST(0.2 AS FLOAT)), x -> CAST(x AS DOUBLE)), " +
      "list_transform(array(CAST(0.3 AS FLOAT), CAST(0.4 AS FLOAT)), x -> CAST(x AS DOUBLE)))").getDouble(0)
    val viaFloat = one(
      "float_dot(array(CAST(0.1 AS FLOAT), CAST(0.2 AS FLOAT)), array(CAST(0.3 AS FLOAT), CAST(0.4 AS FLOAT)))").getDouble(0)
    assert(viaDouble == viaFloat) // exact: float->double widening + same fold order
  }

  test("string_split on a regex-neutral separator keeps trailing empties") {
    assert(one("string_split('a b  c', ' ')").getSeq[String](0) == Seq("a", "b", "", "c"))
    assert(one("string_split('x ', ' ')").getSeq[String](0) == Seq("x", ""))
  }
}
