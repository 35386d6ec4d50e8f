package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{StripAccentsExpr, StripAccentsUtil}
import org.apache.spark.unsafe.types.UTF8String

/** E34 normalization must realize the pinned CCNet chain exactly \u2014
  * each step checked on constructed fixtures (unicode spelled as
  * escapes so the fixture is reviewable), the two load-bearing
  * orderings, idempotence, the dedup composition on variant copies,
  * and the plan shape (row-local, zero exchange). */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def norm(ss: String*): Seq[String] =
    ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
      .withColumn("n", TextNorm.normalizeCol(col("text")))
      .orderBy("doc_id").select("n").as[String].collect().toSeq

  test("each step: case, accents, digits, control chars, whitespace") {
    assert(norm(
      "Hello WORLD",            // case
      "caf\u00e9 na\u00efve",   // precomposed accents
      "cafe\u0301",             // combining mark (NFD input) folds too
      "Page 17 of 204",         // digits unify
      "a\u200bb\u0000c x",      // zero-width + NUL stripped (\p{C})
      "a  b\t c \n d",          // whitespace runs collapse
      " padded  ") ===          // edge whitespace trimmed
      Seq(
        "hello world",
        "cafe naive",
        "cafe",
        "page 00 of 000",
        "abc x",
        "a b c d",
        "padded"))
  }

  test("undecomposable characters pass through accent folding") {
    // \u00df has no NFD decomposition; CJK is untouched; \u00f8 is a letter (no
    // combining mark) and survives \u2014 accent FOLDING, not ASCII
    // transliteration, the CCNet/utf8proc semantics
    assert(norm("stra\u00dfe", "\u4e2d\u6587 text", "s\u00f8rensen") ===
      Seq("stra\u00dfe", "\u4e2d\u6587 text", "s\u00f8rensen"))
  }

  test("order: control strip before collapse; trim last") {
    // a control char INSIDE a space run: stripping first collapses the
    // whole run to one space; collapsing first would leave two spaces
    assert(norm("a \u0001 b") === Seq("a b"))
    // a TRAILING control char becomes trailing whitespace under
    // strip+collapse; trim must run after both or it survives (and the
    // chain would not be idempotent)
    assert(norm("a \u0001") === Seq("a"))
    // a string of only controls and spaces normalizes to empty
    assert(norm(" \u0001 \u200b ") === Seq(""))
  }

  test("idempotent: normalizing a normalized string is the identity") {
    val docs = Seq("CAF\u00c9  17\u200b!", "Hello  WORLD 42", "a \u0001",
      "plain text", " \u0001 ").toDF("text")
    val once = docs.select(TextNorm.normalizeCol(col("text")).as("n"))
    val twice = once.select(TextNorm.normalizeCol(col("n")).as("n"))
    assert(once.as[String].collect().toSeq === twice.as[String].collect().toSeq)
  }

  test("interpreted eval matches codegen for StripAccents") {
    // the expression's nullSafeEval (interpreted path) and the
    // generated code both route through StripAccentsUtil \u2014 pin the
    // helper itself on the fixture set, plus null propagation through
    // the Column API
    val cases = Seq("caf\u00e9", "CAF\u00c9", "ascii only", "",
      "e\u0301\u0301", "\u4e2d\u6587")
    cases.foreach { s =>
      val viaDf = Seq(s).toDF("t")
        .select(StripAccentsExpr.stripAccents(col("t"))).as[String].head()
      assert(viaDf === StripAccentsUtil.strip(UTF8String.fromString(s)).toString)
    }
    val nulls = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(StripAccentsExpr.stripAccents(col("t")).as("n"))
    assert(nulls.filter(col("n").isNull).count() === 1)
  }

  test("dedupNormalized merges case/accent/digit/layout variants, keeps min id") {
    val docs = Seq(
      (10L, "Page 1 of 4: CAF\u00c9 menu"),
      (11L, "page 2 of 4:  caf\u00e9 menu"),  // digit+case+space variant
      (12L, "page 3 of 4: cafe\u0301 menu"),  // NFD accent variant
      (20L, "something else entirely"),
      (21L, "something else entirely")).toDF("doc_id", "text")
    val d = TextNorm.dedupNormalized(docs).orderBy("keep_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSeq
    assert(d === Seq((10L, 3L), (20L, 2L)))
  }

  test("normalize is row-local: zero exchange in the plan") {
    val plan = TextNorm.normalize(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("normalization is key-only on the real corpus: original text untouched") {
    // the ASCII corpus is its own normal form, so dedupNormalized must
    // agree exactly with the raw exact tier there \u2014 and the operator
    // never rewrites text anywhere (it only ever ADDS columns)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val rawClusters = docs.groupBy(col("text"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
    val normClusters = TextNorm.dedupNormalized(docs)
      .select("keep_id", "n_copies")
    assert(normClusters.except(rawClusters).isEmpty &&
      rawClusters.except(normClusters).isEmpty)
    val kept = TextNorm.normalize(docs)
    assert(kept.columns.toSeq === Seq("doc_id", "text", "text_norm"))
  }
}
