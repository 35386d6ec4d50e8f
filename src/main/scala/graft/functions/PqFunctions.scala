package org.apache.spark.sql.graft

// Same private[sql] bridge placement as VecFunctions.scala — these are
// native codegen'd expressions, the repo's G2 pattern (VecDot) applied
// to product quantization: encode once per corpus vector, one table per
// query, then candidate scoring reads m BYTES per vector instead of the
// 4·dim-byte float array. All three are tight primitive loops in both
// interpreted and generated code.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** PQ encode: nearest sub-centroid per subspace → one byte each.
  *
  * `left` = the vector (array<float>, dim = m·dsub); `right` = the flat
  * codebook literal (array<float>, laid out [(j·ksub + c)·dsub + t]).
  * Result: binary of m bytes — the whole index entry for a vector.
  * ksub ≤ 256 so a code always fits one unsigned byte. */
case class PqEncode(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(ksub > 0 && ksub <= 256, "ksub must fit an unsigned byte")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val dsub = v.numElements() / m
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = v.getFloat(j * dsub + t).toDouble - cb.getFloat(base + t).toDouble
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dsub = ctx.freshName("dsub")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val base = ctx.freshName("base")
      s"""
         |int $dsub = $a.numElements() / $m;
         |byte[] $out = new byte[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    int $base = ($j * $ksub + $c) * $dsub;
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      double $diff = (double) $a.getFloat($j * $dsub + $t) - (double) $b.getFloat($base + $t);
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$j] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** ADC table for one query: tab[j·ksub + c] = dot(q_subj, centroid_jc).
  * `left` = query vector, `right` = the flat codebook literal; result is
  * array<float> of m·ksub entries — computed once per query row, then
  * every candidate is scored by m table lookups ([[PqAdc]]). */
case class PqTab(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val dsub = v.numElements() / m
    val tab = new Array[Float](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var acc = 0.0
        var t = 0
        while (t < dsub) {
          acc += v.getFloat(j * dsub + t).toDouble * cb.getFloat(base + t).toDouble
          t += 1
        }
        tab(j * ksub + c) = acc.toFloat
        c += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(tab)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dsub = ctx.freshName("dsub")
      val tab = ctx.freshName("tab")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |int $dsub = $a.numElements() / $m;
         |float[] $tab = new float[$m * $ksub];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    int $base = ($j * $ksub + $c) * $dsub;
         |    double $acc = 0.0;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      $acc += (double) $a.getFloat($j * $dsub + $t) * (double) $b.getFloat($base + $t);
         |    }
         |    $tab[$j * $ksub + $c] = (float) $acc;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tab);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqTab =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric-distance score of one candidate: Σ_j tab[j·ksub + code_j].
  * `left` = the m-byte code (binary), `right` = the query's ADC table;
  * ksub is inferred as tab.length / codes.length. This is the hot loop of
  * PQ search — m array reads and adds per candidate, no float-array
  * deserialization at all. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val tab = b.asInstanceOf[ArrayData]
    val m = codes.length
    val ksub = tab.numElements() / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += tab.getFloat(j * ksub + (codes(j) & 0xff)).toDouble
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      s"""
         |int $m = $a.length;
         |int $ksub = $b.numElements() / $m;
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += (double) $b.getFloat($j * $ksub + (((int) $a[$j]) & 0xff));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  def pqEncode(vec: Column, codebook: Column, m: Int, ksub: Int): Column =
    ExpressionUtils.column(PqEncode(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(codebook), m, ksub))

  def pqTab(query: Column, codebook: Column, m: Int, ksub: Int): Column =
    ExpressionUtils.column(PqTab(
      ExpressionUtils.expression(query), ExpressionUtils.expression(codebook), m, ksub))

  def pqAdc(codes: Column, tab: Column): Column =
    ExpressionUtils.column(PqAdc(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(tab)))
}
