package org.apache.spark.sql.graft

// Lives under org.apache.spark.sql for the private[sql] Expression/Column
// bridge (ExpressionUtils) — the VecDot placement.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling fingerprints of every length-`window` word span —
  * the O(1)-per-position replacement for hashing each span's joined
  * text from scratch (which is O(window) per position: at window 50
  * that is ~50× the hashing work on the one corpus-sized pass span
  * dedup makes). Returns `array<long>` of length
  * `max(0, numWords − window + 1)`: element p is the fingerprint of
  * words [p, p+window).
  *
  * The fingerprint is a degree-(window−1) polynomial over per-word
  * FNV-1a 64 hashes in the odd base B = the FNV prime, evaluated mod
  * 2⁶⁴ (natural long overflow): H(p) = Σ h(wᵢ)·B^(window−1−(i−p)).
  * Sliding is one multiply-subtract-add; each word is hashed ONCE, so
  * the whole array costs O(numWords) regardless of window. Collision
  * class: a polynomial fingerprint does not avalanche and is
  * ADVERSARIALLY collidable (unlike xxhash64 of the joined span);
  * random-input collisions remain ≈2⁻⁶⁴ per pair. Span dedup's
  * contract is unchanged either way — a collision can flag a
  * non-duplicated span, never miss a duplicated one, and the two
  * fingerprint paths are spec'd to flag identical window sets on the
  * real corpus (SpanDupSpec).
  *
  * Array elements must be non-null (the words column comes from
  * `filter(split(...))` — guaranteed upstream, same as SpanDup's
  * joined-hash path).
  */
case class RollingWindowFp(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1, s"window $window must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RollingWindowFp.compute(input.asInstanceOf[ArrayData], window)

  // a static call keeps the expression inside whole-stage codegen (no
  // interpreted fallback) without inlining the two-pass loop
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.RollingWindowFp.compute($a, $window);")

  override protected def withNewChildInternal(newChild: Expression): RollingWindowFp =
    copy(child = newChild)
}

object RollingWindowFp {
  /** Polynomial base and FNV-1a parameters (public constants). */
  final val Base = 0x100000001b3L
  private final val FnvOffset = 0xcbf29ce484222325L

  private[graft] def wordHash(w: UTF8String): Long = {
    var h = FnvOffset
    var i = 0
    val n = w.numBytes()
    while (i < n) { h = (h ^ (w.getByte(i) & 0xffL)) * Base; i += 1 }
    h
  }

  /** The polynomial slide over pre-hashed words — ONE spelling, shared
    * with [[NgramRepetition]] (review wave r18: the fused repetition
    * expression re-implemented this loop, so a future change to the
    * fingerprint math would silently break the spec'd fingerprint-vs-
    * string parity; now both expressions call here and the parity is
    * structural). Returns the `numWords − window + 1` fingerprints;
    * caller guarantees that count is ≥ 1. */
  private[graft] def slide(hs: Array[Long], window: Int): Array[Long] = {
    val m = hs.length - window + 1
    var pow = 1L
    var i = 1
    while (i < window) { pow *= Base; i += 1 }
    val out = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < window) { h = h * Base + hs(i); i += 1 }
    out(0) = h
    i = 1
    while (i < m) {
      h = (h - hs(i - 1) * pow) * Base + hs(i + window - 1)
      out(i) = h
      i += 1
    }
    out
  }

  /** Shared by interpreted eval and codegen — the math lives once. */
  def compute(arr: ArrayData, window: Int): ArrayData = {
    val n = arr.numElements()
    if (n - window + 1 <= 0) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = wordHash(arr.getUTF8String(i)); i += 1 }
    new GenericArrayData(slide(hs, window))
  }

  /** Fingerprint array of `words` as a Column. */
  def rollingFp(words: Column, window: Int): Column =
    ExpressionUtils.column(
      RollingWindowFp(ExpressionUtils.expression(words), window))
}
