package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The C4 rules must drop exactly the lines and pages a single-node
  * implementation of the pinned definitions drops, label every input
  * row, fail closed on pages that clean to nothing, and plan as one
  * narrow projection.
  */
class C4FiltersSpec extends SparkSpec {
  import spark.implicits._

  private object Ref {
    def clean(text: String, minLineWords: Int, minSentences: Int,
        blocklist: Seq[String]): (String, Long, Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean) = {
      val lines = text.split("\n", -1)
      val kept = lines.filter { l =>
        val t = l.replaceAll("\\s+$", "")
        t.nonEmpty && ".!?\"".contains(t.last) &&
          l.trim.split(" +", -1).length >= minLineWords &&
          !l.toLowerCase.contains("javascript")
      }
      val clean = kept.mkString("\n")
      val nSent = clean.count(c => c == '.' || c == '!' || c == '?').toLong
      val words = text.toLowerCase.split("[^a-z0-9]+", -1).toSet
      val fSent = nSent >= minSentences
      val fLorem = !text.toLowerCase.contains("lorem ipsum")
      val fBrace = !text.contains("{")
      val fBlock = !blocklist.map(_.toLowerCase).exists(words.contains)
      (clean, lines.length.toLong, kept.length.toLong, nSent,
        fSent, fLorem, fBrace, fBlock, fSent && fLorem && fBrace && fBlock)
    }
  }

  test("constructed: each line rule and each page rule fires exactly") {
    val docs = Seq(
      // keeper: 3 well-formed sentences on 3 lines
      (1L, "This line has at least five words.\nAnother full line of real prose!\nA third proper sentence ends here?"),
      // line drops: no terminal punct / too few words / javascript
      (2L, "this line has no terminal punctuation\nShort line here.\nPlease enable JavaScript to view content.\nThe only surviving line is this one.\nSecond surviving sentence sits right here.\nA third keeps the page alive."),
      // page drops: lorem ipsum / brace / blocklist word
      (3L, "Lorem ipsum dolor sit amet is fake.\nFiller text pages must all be dropped!\nEven when they look like sentences."),
      (4L, "A code page { return 1; } hides here.\nBraces mean markup not natural prose.\nStill gets dropped by the page rule."),
      (5L, "This page contains the word badword today.\nOtherwise it looks entirely acceptable text.\nBut the blocklist catches it anyway."),
      // fail-closed: every line fails -> cleans to empty -> sentence rule fails
      (6L, "no punct here\nalso none there\nstill none anywhere")
    ).toDF("doc_id", "text")
    val got = C4Filters.c4Clean(docs, blocklist = Seq("badword"))
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(got(1L).getAs[Boolean]("keep"))
    assert(got(1L).getAs[Long]("n_lines_kept") === 3L)

    val d2 = got(2L)
    assert(d2.getAs[Long]("n_lines") === 6L)
    assert(d2.getAs[Long]("n_lines_kept") === 3L)
    assert(!d2.getAs[String]("text_clean").toLowerCase.contains("javascript"))
    assert(d2.getAs[Boolean]("keep"))

    assert(!got(3L).getAs[Boolean]("flag_lorem") && !got(3L).getAs[Boolean]("keep"))
    assert(!got(4L).getAs[Boolean]("flag_brace") && !got(4L).getAs[Boolean]("keep"))
    assert(!got(5L).getAs[Boolean]("flag_blocklist") && !got(5L).getAs[Boolean]("keep"))
    // blocklist matches WORDS, not substrings: doc 1 contains no entry
    assert(got(1L).getAs[Boolean]("flag_blocklist"))

    val d6 = got(6L)
    assert(d6.getAs[String]("text_clean") === "")
    assert(!d6.getAs[Boolean]("flag_sentences") && !d6.getAs[Boolean]("keep"))
    // every input row labeled, none vanished
    assert(got.size === 6)
  }

  test("real-table parity with the single-node reference") {
    // line-ify the newline-free synthetic corpus and add punctuation
    // structure so line rules fire non-trivially
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") < 150).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) =>
        val words = t.split(" ", -1)
        val lined = words.grouped(4).zipWithIndex.map { case (g, i) =>
          g.mkString(" ") + (i % 3 match {
            case 0 => "."
            case 1 => "" // no terminal punct -> line rule drops
            case _ => "!"
          })
        }.mkString("\n")
        (id, lined)
      }.toSeq
    val blocklist = Seq("qfilterme")
    val got = C4Filters.c4Clean(docs.toDF("doc_id", "text"),
        minLineWords = 4, blocklist = blocklist)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size === docs.size)
    docs.foreach { case (id, text) =>
      val (clean, nl, nk, ns, fs, flo, fb, fbl, keep) =
        Ref.clean(text, 4, 3, blocklist)
      val r = got(id)
      assert(r.getAs[String]("text_clean") === clean, s"doc $id clean")
      assert(r.getAs[Long]("n_lines") === nl, s"doc $id n_lines")
      assert(r.getAs[Long]("n_lines_kept") === nk, s"doc $id kept")
      assert(r.getAs[Long]("n_sentences") === ns, s"doc $id sentences")
      assert(r.getAs[Boolean]("flag_sentences") === fs, s"doc $id fs")
      assert(r.getAs[Boolean]("flag_lorem") === flo, s"doc $id florem")
      assert(r.getAs[Boolean]("flag_brace") === fb, s"doc $id fbrace")
      assert(r.getAs[Boolean]("flag_blocklist") === fbl, s"doc $id fblock")
      assert(r.getAs[Boolean]("keep") === keep, s"doc $id keep")
    }
    // the corpus must exercise both outcomes or parity proves nothing
    val keeps = docs.map { case (id, _) => got(id).getAs[Boolean]("keep") }
    assert(keeps.contains(true) && docs.exists { case (id, _) =>
      got(id).getAs[Long]("n_lines_kept") < got(id).getAs[Long]("n_lines") })
  }

  test("guards and plan shape") {
    val df = Seq((1L, "a.")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      C4Filters.c4Clean(df, minLineWords = 0)
    }
    intercept[IllegalArgumentException] {
      C4Filters.c4Clean(df, blocklist = Seq(""))
    }
    val plan = C4Filters.c4Clean(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")),
      blocklist = Seq("x")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"c4Clean must be one narrow projection:\n$plan")
  }
}
