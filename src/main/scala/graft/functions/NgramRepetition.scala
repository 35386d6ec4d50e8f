package org.apache.spark.sql.graft

// Lives under org.apache.spark.sql for the private[sql] Expression/Column
// bridge (ExpressionUtils) — the VecDot/RollingWindowFp placement.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** All nine Gopher n-gram repetition statistics of one document in ONE
  * pass over its token array — the custom-Expression replacement for
  * the nine `array_sort` + `aggregate` higher-order-function chains
  * the first implementation ran per row (r18 directive 6: the
  * repetition core was corpus_report's measured compute floor, 2.02 s
  * single-family at sf0.1 — HOFs evaluate interpreted, per element,
  * per lambda, and each order paid an O(T log T) sort where duplicate
  * detection needs only a hash count).
  *
  * Returns `struct(top2, top3, top4, dup5 … dup10)` of raw CHARACTER
  * counts (the caller divides by `length(text)`):
  *
  *  - `top<n>` = max over distinct n-grams of count × gram chars
  *    (gram chars include internal separators — prefix-sum lookup);
  *  - `dup<n>` = characters covered by the interval UNION of every
  *    occurrence of any n-gram occurring ≥ 2 times, adjacent/
  *    overlapping intervals merged (`p <= e`), each merged interval
  *    contributing its token chars + internal separators.
  *
  * Work shared across all nine orders: each token is FNV-1a-hashed
  * once and its char length prefix-summed once; each order then costs
  * one O(T) rolling-fingerprint slide ([[RollingWindowFp]]'s exact
  * polynomial math — same base, same per-word hash, so the collision
  * class and the spec'd fingerprint-vs-string parity are unchanged)
  * plus one open-addressed count pass. Total O(9·T) with flat
  * constants, no sorts, no per-element lambda dispatch; the
  * expression stays inside whole-stage codegen via the static-call
  * form. GopherRepetitionSpec pins every signal bit-exact against the
  * string-keyed single-node reference; the `gopher_rep` gate pins the
  * top/dup statistics against DuckDB's literal-gram recomputation. */
case class NgramRepetition(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = NgramRepetition.outputType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NgramRepetition.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.NgramRepetition.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): NgramRepetition =
    copy(child = newChild)
}

object NgramRepetition {
  /** The computed orders — PUBLIC so the consumer (GopherRepetition)
    * can assert its own order sets line up with the struct fields
    * instead of trusting three definitions to agree (review wave 2,
    * r18). The slot loop below additionally relies on the two ranges
    * being contiguous. */
  val TopNs: Range = 2 to 4
  val DupNs: Range = 5 to 10

  val outputType: StructType = StructType(
    TopNs.map(n => StructField(s"top$n", LongType, nullable = false)) ++
      DupNs.map(n => StructField(s"dup$n", LongType, nullable = false)))

  /** Open-addressed fingerprint counter (linear probing, power-of-two
    * capacity ≥ 2× load): per distinct fingerprint, the occurrence
    * count and the MINIMUM gram char length — the same tie resolution
    * as sorting (h, c) pairs and reading the run head, so a 2⁻⁶⁴
    * fingerprint collision produces the identical (over-counting,
    * never under-counting) statistic the sorted form produced. */
  /** Largest supported gram count per document — far past any real
    * document (≈268M tokens) and REFUSED loudly past it: the
    * power-of-two capacity doubling would otherwise overflow Int and
    * spin (review wave 2, r18 — the sort-based form degraded
    * gracefully on the same pathological input; a library must not
    * hang where it used to crawl). */
  private val MaxGrams = 1 << 28

  private final class FpCounter(expected: Int) {
    require(expected <= MaxGrams,
      s"document yields $expected n-grams — past the $MaxGrams " +
        "per-document limit of the fused repetition expression; split " +
        "the document (a quarter-billion-token row is upstream damage, " +
        "not a corpus document)")
    private val cap = {
      var c = 4
      while (c < expected * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val keys = new Array[Long](cap)
    private val cnts = new Array[Int](cap)
    private val minC = new Array[Long](cap)

    private def slot(h: Long): Int = {
      // finalizer-style spread: the polynomial fingerprint does not
      // avalanche, and linear probing needs the high bits mixed down
      var i = (((h ^ (h >>> 33)) * 0x9e3779b97f4a7c15L) >>> 40).toInt & mask
      while (cnts(i) != 0 && keys(i) != h) i = (i + 1) & mask
      i
    }

    def add(h: Long, c: Long): Unit = {
      val i = slot(h)
      if (cnts(i) == 0) { keys(i) = h; minC(i) = c }
      else if (c < minC(i)) minC(i) = c
      cnts(i) += 1
    }

    def count(h: Long): Int = cnts(slot(h))

    /** max over distinct grams of count × min-chars (count-1 grams
      * included — "top" is the best statistic, not the best repeat). */
    def best: Long = {
      var b = 0L
      var i = 0
      while (i < cap) {
        if (cnts(i) != 0) {
          val v = cnts(i).toLong * minC(i)
          if (v > b) b = v
        }
        i += 1
      }
      b
    }
  }

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val hs = new Array[Long](n)
    val pre = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      hs(i) = RollingWindowFp.wordHash(w)
      pre(i + 1) = pre(i) + w.numChars()
      i += 1
    }
    // gram chars at position p, order ng: token chars + internal seps
    def chars(p: Int, ng: Int): Long = pre(p + ng) - pre(p) + (ng - 1)

    val out = new Array[Any](TopNs.size + DupNs.size)
    var slot = 0
    var ng = TopNs.head
    while (ng <= DupNs.last) {
      val m = n - ng + 1
      val isTop = ng <= TopNs.last
      out(slot) =
        if (m <= 0 || (!isTop && m < 2)) 0L
        else {
          // the ONE fingerprint slide (RollingWindowFp.slide) over the
          // shared per-token hashes — parity with the string path is
          // structural, not copy-maintained
          val fp = RollingWindowFp.slide(hs, ng)
          val counter = new FpCounter(m)
          var p = 0
          while (p < m) { counter.add(fp(p), chars(p, ng)); p += 1 }
          if (isTop) counter.best
          else {
            // interval union over flagged positions, ascending by
            // construction; merged intervals are disjoint, each
            // contributes its covered chars + internal separators
            var s = -1
            var e = -1
            var acc = 0L
            p = 0
            while (p < m) {
              if (counter.count(fp(p)) >= 2) {
                if (s < 0) { s = p; e = p + ng }
                else if (p <= e) { if (p + ng > e) e = p + ng }
                else {
                  acc += pre(e) - pre(s) + (e - s - 1)
                  s = p; e = p + ng
                }
              }
              p += 1
            }
            if (s >= 0) acc += pre(e) - pre(s) + (e - s - 1)
            acc
          }
        }
      slot += 1
      ng += 1
    }
    new GenericInternalRow(out)
  }

  /** The nine-signal struct of `words` as a Column. */
  def ngramRepetition(words: Column): Column =
    ExpressionUtils.column(
      NgramRepetition(ExpressionUtils.expression(words)))
}
