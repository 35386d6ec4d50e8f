package org.apache.spark.sql.graft

// Same private[sql] bridge placement as VecFunctions.scala — see the
// note there.

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair for crawl text (SURVEY §2 E37): undo the classic
  * "UTF-8 bytes decoded as Latin-1/Windows-1252" corruption — "cafÃ©"
  * → "café", "donâ€™t" → "don’t" — by REVERSING the mis-decode: map
  * every char of the string back to the byte it came from (identity
  * for 0x00–0xFF Latin-1 chars, the cp1252 table for the € ™ ’ “ ”
  * – — … ‹ › Œ Š Ž range the C1 block aliases to) and strictly
  * re-decode those bytes as UTF-8. This is the algorithmic core of
  * ftfy's `fix_encoding` (Speer 2019) — the repair step OSCAR/C4-era
  * pipelines run before any text gate, because a gate that sees
  * "donâ€™t" counts three garbage tokens where the author wrote one.
  *
  * Pinned acceptance rule (why this cannot corrupt clean text):
  *   - a repair is accepted ONLY if every char of the string maps to a
  *     byte (a single genuine CJK/emoji char anywhere vetoes — real
  *     non-Latin text is not mojibake) AND the bytes decode as STRICT
  *     UTF-8 (no replacement chars, malformed input vetoes) AND the
  *     result is strictly shorter (some multi-byte sequence was
  *     actually consumed; pure-ASCII and identity round-trips veto).
  *   - genuinely-Latin-1 text ("déjà vu") survives untouched: its
  *     bytes (E9 'j' …) are malformed UTF-8, so the strict decode
  *     vetoes. MIXED text (one mojibake run spliced into clean
  *     accented text) also vetoes — repair is all-or-nothing per
  *     string, the conservative reading of ftfy's segment heuristics
  *     (a rule engine should under-repair, never over-repair).
  *   - repeats to a FIXPOINT capped at 3 rounds: each accepted round
  *     strictly shortens, and triple-encoding is the practical
  *     maximum observed in the wild (ftfy's own default depth).
  *
  * ASCII fast path returns the input buffer untouched (the
  * StripAccents convention — the common case after upstream gates
  * costs one vectorized scan, no allocation).
  */
case class FixMojibake(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    MojibakeUtil.fix(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.MojibakeUtil.fix($c)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

/** Static helper the generated code calls. */
object MojibakeUtil {

  /** cp1252 bytes 0x80–0x9F decode to these Unicode chars (0 marks the
    * five undefined holes 81 8D 8F 90 9D). Reversing the table lets a
    * mis-decode through EITHER Windows-1252 (smart quotes as ’ “ ”)
    * or plain Latin-1 (the same bytes as C1 controls) map back. */
  private val Cp1252High: Array[Char] = Array(
    '€', 0, '‚', 'ƒ', '„', '…', '†', '‡',
    'ˆ', '‰', 'Š', '‹', 'Œ', 0, 'Ž', 0,
    0, '‘', '’', '“', '”', '•', '–', '—',
    '˜', '™', 'š', '›', 'œ', 0, 'ž', 'Ÿ')

  private val Reverse: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte]()
    var i = 0
    while (i < 32) {
      if (Cp1252High(i) != 0)
        m.put(Cp1252High(i), (0x80 + i).toByte)
      i += 1
    }
    m
  }

  /** One reversal round: null = veto (not repairable). */
  private def repairOnce(t: String): String = {
    val bytes = new Array[Byte](t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c < 0x100) bytes(i) = c.toByte // Latin-1 identity incl. C1
      else {
        val b = Reverse.get(Character.valueOf(c))
        if (b == null) return null // genuine non-Latin char: veto
        bytes(i) = b.byteValue()
      }
      i += 1
    }
    val dec = StandardCharsets.UTF_8.newDecoder() // strict: REPORTs
    try {
      val out = dec.decode(ByteBuffer.wrap(bytes)).toString
      if (out.length < t.length) out else null // must consume multibyte
    } catch { case _: CharacterCodingException => null }
  }

  def fix(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s // no non-ASCII, no mojibake
    var cur = s.toString
    var changed = false
    var rounds = 0
    while (rounds < 3) {
      val next = repairOnce(cur)
      if (next == null) {
        return if (changed) UTF8String.fromString(cur) else s
      }
      cur = next
      changed = true
      rounds += 1
    }
    UTF8String.fromString(cur)
  }
}

object MojibakeExpr {
  /** fix_mojibake(s) as a Column. */
  def fixMojibake(s: Column): Column =
    ExpressionUtils.column(FixMojibake(ExpressionUtils.expression(s)))
}
