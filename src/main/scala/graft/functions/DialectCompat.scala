package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Dialect-compatibility spellings (installed by `graft.GraftExtensions`):
  * the handful of common-warehouse-dialect functions Spark lacks (or
  * spells differently), each a pure REWRITE to builtin Catalyst
  * expressions — codegen'd, zero UDF tier, zero new evaluation code.
  * With these installed, the catalog's oracle SQL texts — written once
  * in the shared Spark∩DuckDB dialect — run verbatim on this engine
  * (`SqlParitySpec` pins result equality per query).
  *
  * Semantics notes (each alias is exactly matched, not approximately):
  *   - `len` dispatches on argument type: character length for strings,
  *     element count for arrays (Spark's builtin `len` is char-only).
  *   - `range(a, b)` is the half-open integer range [a, b), EMPTY when
  *     b <= a — Spark's `sequence(a, b-1)` alone would count DOWNWARD
  *     there (negative default step), the short-input trap the t12/m3
  *     operators guard against.
  *   - `regexp_replace(s, re, rep, 'g')` accepts the global flag as a
  *     no-op (global is Spark's default); other string flags are
  *     rejected at analysis rather than silently mis-read as the
  *     builtin's integer position argument.
  *   - `string_split_regex` keeps trailing empty fields (split limit
  *     -1), matching the warehouse-dialect splitter bit-for-bit —
  *     including `'' -> ['']`.
  */
object DialectCompat {

  /** Polymorphic length: array -> size, anything else -> char length. */
  case class DuckLen(child: Expression)
      extends RuntimeReplaceable with UnaryLike[Expression] {
    override lazy val replacement: Expression = child.dataType match {
      case _: ArrayType => Size(child)
      case _            => Length(child)
    }
    override def prettyName: String = "len"
    override protected def withNewChildInternal(newChild: Expression): DuckLen =
      copy(child = newChild)
  }

  /** Half-open [a, b) (or [0, a) for the 1-arg form) as array<bigint>;
    * empty when b <= a. */
  def rangeCompat(exprs: Seq[Expression]): Expression = {
    val (a, b) = exprs match {
      case Seq(n)     => (Literal(0L), n)
      case Seq(x, y)  => (x, y)
      case _ => throw new IllegalArgumentException(
        s"range expects 1 or 2 arguments, got ${exprs.length}")
    }
    val lo = Cast(a, LongType)
    val hi = Cast(b, LongType)
    If(GreaterThan(hi, lo),
      new Sequence(lo, Subtract(hi, Literal(1L)), Some(Literal(1L))),
      Literal.create(Array.empty[Long], ArrayType(LongType)))
  }

  /** regexp_extract_all whose 2-arg form returns FULL matches (group 0)
    * — Spark's builtin defaults the group index to 1 there, which
    * rejects group-free patterns outright. */
  def regexpExtractAllCompat(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(s, re)      => RegExpExtractAll(s, re, Literal(0))
    case Seq(s, re, idx) => RegExpExtractAll(s, re, idx)
    case _ => throw new IllegalArgumentException(
      s"regexp_extract_all expects 2 or 3 arguments, got ${exprs.length}")
  }

  /** regexp_replace with an optional trailing regex-flags argument. Any
    * LITERAL STRING 4th argument is matched here and only 'g' accepted —
    * letting e.g. 'i' fall through to the position branch would have
    * Spark implicitly cast the flag string to INT (null) and silently
    * return NULL at runtime instead of failing at analysis. Integer
    * positions keep the builtin behaviour. */
  def regexpReplaceCompat(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(s, re, rep) => RegExpReplace(s, re, rep)
    case Seq(s, re, rep, Literal(flags, org.apache.spark.sql.types.StringType)) =>
      if (flags != null && flags.toString == "g") RegExpReplace(s, re, rep)
      else throw new IllegalArgumentException(
        s"regexp_replace: unsupported regex flags '$flags' (only 'g' is accepted)")
    case Seq(s, re, rep, pos) => RegExpReplace(s, re, rep, pos)
    case _ => throw new IllegalArgumentException(
      s"regexp_replace expects 3 or 4 arguments, got ${exprs.length}")
  }
}
