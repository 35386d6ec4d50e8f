package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MojibakeExpr.fixMojibake

class TextRepairSpec extends SparkSpec {

  private def fixOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(fixMojibake(col("t"))).head().getString(0)
  }

  test("classic single-encoded mojibake repairs to the intended text") {
    // UTF-8 bytes of each intended string read back as cp1252/Latin-1
    assert(fixOne("cafÃ©") === "café")
    assert(fixOne("donâ€™t") === "don’t")
    assert(fixOne("naÃ¯ve rÃ©sumÃ©") === "naïve résumé")
    assert(fixOne("â€œquotedâ€ â€” dash â€¦") === "“quoted” — dash …")
    assert(fixOne("50â‚¬") === "50€") // € rides the cp1252 0x80 alias
  }

  test("double-encoded text converges to the fixpoint within the round cap") {
    // encode "café" as UTF-8, mis-decode as Latin-1, re-encode, mis-decode
    def corrupt(s: String): String =
      new String(s.getBytes("UTF-8"), "ISO-8859-1")
    val once = corrupt("café")
    val twice = corrupt(once)
    val thrice = corrupt(twice)
    assert(fixOne(once) === "café")
    assert(fixOne(twice) === "café")
    assert(fixOne(thrice) === "café")
    // idempotence on the repaired form: a fixpoint stays fixed
    assert(fixOne(fixOne(twice)) === "café")
  }

  test("clean text is never touched: ASCII, genuine Latin-1, CJK, emoji") {
    for (s <- Seq("plain ascii text", "déjà vu — naïve café",
        "日本語のテキスト", "mixed 中文 and ascii", "emoji 🙂 here",
        "5 < 6 & 7 > 2", "")) {
      assert(fixOne(s) === s, s"corrupted clean text: $s")
    }
  }

  test("mixed clean-plus-mojibake strings veto (under-repair, never over-repair)") {
    // é (genuine, bytes malformed as UTF-8) + Ã© (mojibake) in one
    // string: the all-or-nothing rule must leave BOTH alone
    val mixed = "déjà plus cafÃ©"
    assert(fixOne(mixed) === mixed)
  }

  test("eval and codegen agree, nulls propagate") {
    import spark.implicits._
    val df = Seq(Some("cafÃ©"), Some("plain"), None).toDF("t")
    // codegen path (projection) and interpreted eval (the expression's
    // nullSafeEval, exercised directly) must agree
    val rows = df.select(fixMojibake(col("t"))).collect()
    assert(rows(0).getString(0) === "café")
    assert(rows(1).getString(0) === "plain")
    assert(rows(2).isNullAt(0))
    import org.apache.spark.unsafe.types.UTF8String
    assert(org.apache.spark.sql.graft.MojibakeUtil
      .fix(UTF8String.fromString("cafÃ©")).toString === "café")
    // interpreted filter (codegen off) sees the same values
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(fixMojibake(col("t"))).collect()
      assert(off.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
        === rows.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("normalization-key composition: repair-then-normalize merges with the clean twin") {
    import spark.implicits._
    val docs = Seq((1L, "café society"), (2L, "cafÃ© society"))
      .toDF("doc_id", "text")
    // without repair: different keys
    val rawKeys = docs.select(TextNorm.normKey(col("text"))).distinct().count()
    assert(rawKeys === 2)
    // with repair first: one key
    val fixedKeys = TextRepair.fixEncoding(docs)
      .select(TextNorm.normKey(col("text_fixed"))).distinct().count()
    assert(fixedKeys === 1)
  }

  test("repairStats counts repaired docs and the honest residue") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text"), (2L, "cafÃ© one"), (3L, "donâ€™t two"),
      (4L, "déjà mixed cafÃ© veto")) // vetoed: marker survives repair
      .toDF("doc_id", "text")
    val r = TextRepair.repairStats(docs).head()
    assert(r.getLong(0) === 4)
    assert(r.getLong(1) === 2)  // docs 2 and 3 repaired
    assert(r.getLong(2) === 1)  // doc 4 still carries the marker
  }

  test("real corpus (pure ASCII) passes through bit-identical, zero repairs") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val out = TextRepair.fixEncoding(docs)
    assert(out.filter(col("was_mojibake")).count() === 0)
    assert(out.filter(col("text_fixed") =!= col("text")).count() === 0)
  }

  test("plan shape: one row-local projection, no exchange") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val plan = TextRepair.fixEncoding(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
  }
}
