package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** The engine's one custom Catalyst expression family (SURVEY.md §7.4):
  * vector kernels over `array<float>` embedding columns.
  *
  * Why custom: Spark has no builtin dot product, and the higher-order-
  * function composition (`aggregate(zip_with(...))`) evaluates
  * interpreted lambdas per element — measured ~25× slower than this
  * codegen'd loop on the all-pairs similarity workload (it also breaks
  * WholeStageCodegen for the whole stage). `FloatDotProduct` generates
  * a tight primitive `double` loop directly over the columnar
  * `ArrayData` — no boxing, no per-element virtual calls, fused into
  * the surrounding generated code.
  *
  * Semantics: left-to-right summation of `(double)a[i] * (double)b[i]`
  * — element order, identical to the HOF left fold it replaces, so
  * results are bit-identical and deterministic at any parallelism
  * (the per-pair loop is sequential; parallelism is across rows).
  */
case class FloatDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** `list_dot_product(a, b)` — the warehouse-dialect spelling of the dot
  * product, accepting float OR double arrays (the parity oracle texts
  * compute over `list_transform(embedding, v -> CAST(v AS DOUBLE))`).
  * Same left-to-right double accumulation as `FloatDotProduct`, and
  * float→double widening is exact, so over cast-to-double embeddings
  * this produces the BIT-IDENTICAL result to the engine's float_dot
  * kernel — which is what lets s1/s2's oracle texts run verbatim on
  * Spark SQL and still match the DataFrame programs row-for-row. */
case class ListDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"list_dot_product requires float/double arrays, got " +
          s"(${left.dataType}, ${right.dataType})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "list_dot_product"

  private def get(x: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType => x.getFloat(i).toDouble
    case _         => x.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elem(left.dataType).get, elem(right.dataType).get)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(x, lt, i) * get(y, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(arr: String, dt: DataType, i: String): String = dt match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _         => s"$arr.getDouble($i)"
      }
      val (lt, rt) = (elem(left.dataType).get, elem(right.dataType).get)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(a, lt, i)} * ${getter(b, rt, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ListDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Idempotently register the kernels as temp SQL functions so both the
    * Column API (via call_function) and spark.sql can use them — once
    * per session, memoized in the session's OWN registry (the old
    * strong-keyed TrieMap retained every session ever passed in;
    * [[Registration]] carries the full rationale). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "float_dot",
      exprs => FloatDotProduct(exprs(0), exprs(1)))

  /** Dot product of two float-array columns (double result). */
  def fdot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("float_dot", a, b)
  }
}
