package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The thirteen Gopher repetition signals must equal a single-node
  * implementation of the pinned definitions exactly (IEEE divides of
  * the same exact integers — bit equality, no tolerance), the flags
  * must cut at the paper's thresholds, and the whole suite must plan
  * as ONE narrow projection: no exchange of any kind.
  */
class GopherRepetitionSpec extends SparkSpec {
  import spark.implicits._

  /** Single-node reference of the operator's documented definitions:
    * string-keyed gram counts (no fingerprints), a boolean coverage
    * array for the duplicate-gram union, first-occurrence duplicate
    * accounting via the distinct-set arithmetic. */
  private object Ref {
    def signals(text: String): Map[String, Double] = {
      val nc = text.length.toLong
      val toks = text.split(" ", -1)

      def dupSeg(segs: Array[String], prefix: String): Seq[(String, Double)] = {
        val n = segs.length
        val dist = segs.distinct
        val dupChars = segs.map(_.length.toLong).sum - dist.map(_.length.toLong).sum
        Seq(
          s"dup_${prefix}_frac" -> (n - dist.length).toDouble / n,
          s"dup_${prefix}_char_frac" ->
            (if (nc > 0) dupChars.toDouble / nc else 0.0))
      }

      def grams(n: Int): IndexedSeq[String] =
        if (toks.length < n) IndexedSeq.empty
        else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))

      def topFrac(n: Int): Double = {
        val g = grams(n)
        if (g.isEmpty || nc == 0) 0.0
        else g.groupBy(identity)
          .map { case (k, v) => v.length.toLong * k.length }.max.toDouble / nc
      }

      def dupCover(n: Int): Double = {
        val g = grams(n)
        if (g.length < 2 || nc == 0) return 0.0
        val counts = g.groupBy(identity).map { case (k, v) => k -> v.length }
        val covered = Array.fill(toks.length)(false)
        for (i <- g.indices if counts(g(i)) >= 2; j <- i until i + n)
          covered(j) = true
        var acc = 0L
        var i = 0
        while (i < toks.length) {
          if (covered(i)) {
            var j = i
            while (j < toks.length && covered(j)) j += 1
            acc += (i until j).map(toks(_).length.toLong).sum + (j - i - 1)
            i = j
          } else i += 1
        }
        acc.toDouble / nc
      }

      (dupSeg(text.split("\n", -1), "line") ++
        dupSeg(text.split("\n\n", -1), "para") ++
        GopherRepetition.TopNs.map(n => s"top_${n}gram_char_frac" -> topFrac(n)) ++
        GopherRepetition.DupNs.map(n => s"dup_${n}gram_char_frac" -> dupCover(n))).toMap
    }
  }

  private val signalNames: Seq[String] =
    GopherRepetition.DefaultThresholds.map(_._1)

  private def engineSignals(rows: Seq[(Long, String)]): Map[Long, Map[String, Double]] =
    GopherRepetition.repetitionSignals(rows.toDF("doc_id", "text"))
      .collect().map { r =>
        r.getLong(0) -> signalNames.map(n => n -> r.getDouble(r.fieldIndex(n))).toMap
      }.toMap

  test("constructed exact arithmetic: lines, top-gram, adjacent-merge coverage") {
    val lineDoc = "aa\nbb\naa\ncc"          // 4 lines, one dup pair, nc=11
    val topDoc = "a b a b a b"              // "a b" ×3 · 3 chars = 9, nc=11
    val adjDoc = "q w e r t q w e r t"      // two ADJACENT dup 5-grams -> full cover
    val overlapDoc = "a b c a b c a b c"    // overlapping dup 5-grams -> full cover
    val shortDoc = "w x y z"                // under every n: all gram signals 0
    val got = engineSignals(Seq(
      (1L, lineDoc), (2L, topDoc), (3L, adjDoc), (4L, overlapDoc), (5L, shortDoc)))

    assert(got(1L)("dup_line_frac") === 0.25)
    assert(got(1L)("dup_line_char_frac") === 2.0 / 11)
    assert(got(1L)("dup_para_frac") === 0.0)
    assert(got(2L)("top_2gram_char_frac") === 9.0 / 11)
    // adjacency: [0,5) and [5,10) merge; the seam separator is covered
    assert(got(3L)("dup_5gram_char_frac") === 1.0)
    assert(got(4L)("dup_5gram_char_frac") === 1.0)
    GopherRepetition.DupNs.foreach { n =>
      assert(got(5L)(s"dup_${n}gram_char_frac") === 0.0)
    }
    assert(got(5L)("top_2gram_char_frac") ===
      Ref.signals(shortDoc)("top_2gram_char_frac"))
    // every constructed doc matches the reference on every signal
    Seq(1L -> lineDoc, 2L -> topDoc, 3L -> adjDoc, 4L -> overlapDoc,
      5L -> shortDoc).foreach { case (id, text) =>
      val ref = Ref.signals(text)
      signalNames.foreach { s =>
        assert(got(id)(s) === ref(s), s"doc $id signal $s")
      }
    }
  }

  test("real-table parity: every signal equals the single-node reference bit-exactly") {
    // line-ify a slice of the real corpus (the newline-free synthetic
    // text gets real line/paragraph structure: every 5th word break
    // becomes a newline, every 15th a paragraph break) and seed
    // repetition so the dup signals are non-trivially exercised
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") < 150)
      .select(col("doc_id"),
        concat(col("text"), lit(" "), col("text")).as("text"))
      .as[(Long, String)].collect()
      .map { case (id, t) =>
        val words = t.split(" ", -1)
        val lined = words.zipWithIndex.map { case (w, i) =>
          if (i == 0) w
          else if (i % 15 == 0) "\n\n" + w
          else if (i % 5 == 0) "\n" + w
          else " " + w
        }.mkString("")
        (id, lined)
      }.toSeq
    val got = engineSignals(docs)
    assert(got.size === docs.size)
    docs.foreach { case (id, text) =>
      val ref = Ref.signals(text)
      signalNames.foreach { s =>
        assert(got(id)(s) === ref(s), s"doc $id signal $s")
      }
    }
    // the doubled text makes the whole-doc 5-gram repeat: coverage must
    // be substantial somewhere, or the parity test is testing zeros
    assert(docs.map { case (id, _) => got(id)("dup_5gram_char_frac") }.max > 0.5)
  }

  test("flags cut at the paper's thresholds; pass is the conjunction") {
    val clean = (1 to 60).map(i => s"w$i").mkString(" ") // all distinct
    val liney = Array.fill(10)("the same exact line").mkString("\n")
    val df = Seq((1L, clean), (2L, liney)).toDF("doc_id", "text")
    val got = GopherRepetition.repetitionFlags(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(got(1L).fieldIndex("pass_repetition")))
    assert(!got(2L).getBoolean(got(2L).fieldIndex("flag_dup_line_frac")))
    assert(!got(2L).getBoolean(got(2L).fieldIndex("pass_repetition")))
    // unknown threshold name fails loudly
    val err = intercept[IllegalArgumentException] {
      GopherRepetition.repetitionFlags(df, thresholds = Seq("nope" -> 0.5))
    }
    assert(err.getMessage.contains("unknown signal"))
  }

  test("plan: one narrow projection — no exchange, no join, no window") {
    val df = GopherRepetition.repetitionSignals(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")))
    df.collect() // force execution so the executed plan is final
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    // the fused NgramRepetition expression must stay INSIDE whole-stage
    // codegen (the static-call doGenCode form, r18) — a fallback to
    // interpreted projection would silently re-pay the per-row virtual
    // dispatch the fusion removed
    val exec = df.queryExecution.executedPlan
    val codegenned = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.exists(_.exists(_.isInstanceOf[org.apache.spark.sql.execution.ProjectExec]))
    assert(codegenned,
      s"the signal projection fell out of WholeStageCodegen:\n$plan")
  }
}
