package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{FixMojibake, StripAccents, VecDot}

/** Extension entry point for cluster deployment:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes the
  * native functions available in every session without code changes —
  * the standard SparkSessionExtensions injection path. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      exprs => VecDot(exprs(0), exprs(1))))
    extensions.injectFunction((
      FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      exprs => StripAccents(exprs(0))))
    extensions.injectFunction((
      FunctionIdentifier("fix_mojibake"),
      new ExpressionInfo(classOf[FixMojibake].getName, "fix_mojibake"),
      exprs => FixMojibake(exprs(0))))
  }
}
