package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{FixMojibake, PqAdc, PqEncode, PqTab, StripAccents, VecDot}
import org.apache.spark.sql.types.IntegerType

/** The extension-jar injection point: makes graft's native expressions
  * available to pure-SQL users on any session started with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions())`).
  * This is the deployment path for a cluster where jobs are submitted as
  * SQL — the programmatic Column API (VecDot.vecDot, PqFunctions.*)
  * needs no registration.
  *
  * SQL surface:
  *   vec_dot(a, b)                  exact left-fold float dot product
  *   vec_cosine(a, b)               cosine via the same fold
  *   pq_encode(vec, codebook, m, k) m-byte PQ code (m, k literal ints)
  *   pq_tab(query, codebook, m, k)  per-query ADC table
  *   pq_adc(codes, tab)             ADC candidate score
  *   strip_accents(s)               NFD accent folding (E34)
  *   fix_mojibake(s)                encoding repair (E37)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_cosine"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        Divide(VecDot(es(0), es(1)),
          Multiply(Sqrt(VecDot(es(0), es(0))), Sqrt(VecDot(es(1), es(1)))))
      }))
    ext.injectFunction((FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (es: Seq[Expression]) => PqEncode(es(0), es(1),
        litInt(es(2), "pq_encode m"), litInt(es(3), "pq_encode ksub"))))
    ext.injectFunction((FunctionIdentifier("pq_tab"),
      new ExpressionInfo(classOf[PqTab].getName, "pq_tab"),
      (es: Seq[Expression]) => PqTab(es(0), es(1),
        litInt(es(2), "pq_tab m"), litInt(es(3), "pq_tab ksub"))))
    ext.injectFunction((FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (es: Seq[Expression]) => PqAdc(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (es: Seq[Expression]) => StripAccents(es(0))))
    ext.injectFunction((FunctionIdentifier("fix_mojibake"),
      new ExpressionInfo(classOf[FixMojibake].getName, "fix_mojibake"),
      (es: Seq[Expression]) => FixMojibake(es(0))))
  }
}
