package org.apache.spark.sql.graft

// Same private[sql] bridge placement as VecFunctions.scala — see the
// note there.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding for dedup-key normalization (SURVEY §2 E34): NFD
  * decomposition, then drop non-spacing combining marks (Unicode
  * category Mn) — "é" → "e", "ñ" → "n", characters without a canonical
  * decomposition (ß, CJK, emoji) pass through unchanged. This is the
  * `unicodedata.normalize('NFD', ...)` + strip-combining step of
  * CCNet's dedup normalization (Wenzek et al. 2020, text_normalizer),
  * and matches utf8proc's strip_accents (DuckDB's function of the same
  * name) on the Latin-1/Latin-Extended range the published pipelines
  * care about.
  *
  * No built-in Spark SQL function performs Unicode normalization, so
  * this is the repo's second native codegen'd expression (the VecDot
  * precedent): a scalar UDF would deserialize to String per row AND
  * break whole-stage codegen for the surrounding normalization chain;
  * this stays inside the generated loop as one static call, with an
  * ASCII fast path that skips normalization entirely (the common case
  * for web text after upstream gates — and zero-copy: the input
  * UTF8String is returned as-is).
  */
case class StripAccents(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    StripAccentsUtil.strip(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.StripAccentsUtil.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

/** Static helper the generated code calls (Scala object = static
  * forwarders, callable from Janino-compiled codegen). */
object StripAccentsUtil {
  def strip(s: UTF8String): UTF8String = {
    // ASCII fast path: nothing to normalize, return the input buffer
    if (s.isFullAscii) return s
    val nfd = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

object StripAccentsExpr {
  /** strip_accents(s) as a Column. */
  def stripAccents(s: Column): Column =
    ExpressionUtils.column(StripAccents(ExpressionUtils.expression(s)))
}
