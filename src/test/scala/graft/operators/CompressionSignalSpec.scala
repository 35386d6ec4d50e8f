package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompressionSignalSpec extends SparkSpec {
  import spark.implicits._

  test("repetitive text compresses far below prose; high-entropy barely at all") {
    val rep = "spam ham " * 400
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "wanders across nine quiet villages carrying seventeen strange maps ") * 8
    val rnd = new scala.util.Random(7)
    val noise = Array.fill(3000)((rnd.nextInt(94) + 33).toChar).mkString
    val df = Seq(("rep", rep), ("prose", prose), ("noise", noise))
      .toDF("id", "text")
    val got = CompressionSignal.score(df, "text")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got("rep") < 0.05, s"repetitive ratio ${got("rep")}")
    assert(got("prose") > 0.1 && got("prose") < 0.6,
      s"prose ratio ${got("prose")}")
    assert(got("noise") > 0.8, s"noise ratio ${got("noise")}")
  }

  test("score is deterministic and exact byte counts ride along") {
    val df = Seq(("a", "hello world hello world")).toDF("id", "text")
    val r1 = CompressionSignal.score(df, "text").collect().head
    val r2 = CompressionSignal.score(df, "text").collect().head
    assert(r1.getLong(2) === 23L)
    assert(r1.getLong(3) === r2.getLong(3))
    assert(r1.getDouble(4) === r2.getDouble(4))
    // multi-byte UTF-8 counted as bytes, not chars
    val uni = CompressionSignal.score(
      Seq(("u", "héllo")).toDF("id", "text"), "text").collect().head
    assert(uni.getLong(2) === 6L)
  }

  test("empty and NULL text pin NULL ratio; the gate fails them closed") {
    val df = Seq(("e", Some("")), ("n", Option.empty[String]),
      ("ok", Some("perfectly ordinary sentence with mixed words here")))
      .toDF("id", "text")
    val rows = CompressionSignal.gate(df, "text", minRatio = 0.0, maxRatio = 1.5)
      .collect().map(r => r.getString(0) ->
        (r.isNullAt(4), r.getBoolean(5))).toMap
    assert(rows(("e")) === ((true, false)))
    assert(rows(("n")) === ((true, false)))
    assert(rows(("ok")) === ((false, true)))
  }

  test("gate band flags both failure modes on the real corpus shape") {
    val docs = graft.Tables.documents(spark, sf).limit(200)
    val out = CompressionSignal.gate(docs, "text")
    assert(out.count() === 200)
    assert(out.filter(col("compress_ratio").isNull &&
      col("compress_keep")).count() === 0)
  }

  test("plan: no shuffle — the signal rides the scan") {
    val out = CompressionSignal.score(
      graft.Tables.documents(spark, sf).select("doc_id", "text"), "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
