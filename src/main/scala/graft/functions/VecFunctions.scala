package org.apache.spark.sql.graft

// Lives under org.apache.spark.sql so it can use the private[sql]
// Expression/Column bridge (ExpressionUtils) and typed input checks —
// the same placement Spark's own extension libraries use.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._

/** Native codegen'd dot product over `array<float>` columns (SURVEY §2 G2).
  *
  * Semantics are EXACTLY the declarative left-fold
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` used by
  * the oracle SQL (and DuckDB's list_reduce): widen each float to double,
  * multiply, accumulate left-to-right. The win is mechanical, not
  * semantic: the higher-order-function path allocates a lambda frame and
  * boxes per element, while this compiles to a tight primitive loop inside
  * whole-stage codegen — ~10× on the all-pairs similarity operators.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

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
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** dot(a, b) as a Column. */
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** L2 norm via the same exact fold (sqrt of self-dot). */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** cosine similarity with the oracle's exact expression shape. */
  def cosine(a: Column, aNorm: Column, b: Column, bNorm: Column): Column =
    vecDot(a, b) / (aNorm * bNorm)
}

/** SQL-surface registration so `spark.sql("... vec_dot(a, b) ...")` works —
  * the FunctionRegistry injection point an extension jar would use via
  * SparkSessionExtensions.injectFunction. */
object VecFunctions {
  import org.apache.spark.sql.SparkSession
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
  }
}
