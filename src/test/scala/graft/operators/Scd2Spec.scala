package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // (key, attr, ts-micros, tie)
  private def log(rows: (Int, String, Long, Int)*) =
    rows.toSeq.toDF("k", "attr", "us", "tie")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")

  private def hist(rows: (Int, String, Long, Int)*) =
    Scd2.build(log(rows: _*), Seq("k"), Seq("attr"), "ts", Seq("tie"))

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("attr"), unix_micros(col("valid_from")),
        unix_micros(col("valid_to")), col("is_current"))
      .collect().map { r =>
        (r.getInt(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))
      }.toSet

  test("build collapses no-op re-observations and assigns half-open intervals") {
    val h = hist(
      (1, "A", 10L, 1), (1, "A", 20L, 2), (1, "B", 30L, 3),
      (1, "B", 40L, 4), (1, "A", 50L, 5),
      (2, "X", 15L, 6))
    assert(asTuples(h) === Set(
      (1, "A", 10L, 30L, false),
      (1, "B", 30L, 50L, false),
      (1, "A", 50L, -1L, true),
      (2, "X", 15L, -1L, true)))
  }

  test("collapse is null-safe: null attr is a state, not a wildcard") {
    val df = Seq((1, Option("A"), 10L, 1), (1, Option.empty[String], 20L, 2),
        (1, Option.empty[String], 30L, 3), (1, Option("A"), 40L, 4))
      .toDF("k", "attr", "us", "tie")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val h = Scd2.build(df, Seq("k"), Seq("attr"), "ts", Seq("tie"))
    val states = h.orderBy("valid_from").select("attr").collect().map(r =>
      Option(r.getString(0)))
    assert(states.toSeq === Seq(Some("A"), None, Some("A")))
  }

  test("timestamp collisions order by the tie column") {
    val h = hist((1, "B", 10L, 2), (1, "A", 10L, 1))
    val ordered = h.orderBy("valid_from", "tie")
      .select("attr", "is_current").collect()
    assert(ordered.map(_.getString(0)).toSeq === Seq("A", "B"))
    assert(ordered.map(_.getBoolean(1)).toSeq === Seq(false, true))
  }

  test("asOf is half-open: exact change instant sees the NEW state") {
    val h = hist((1, "A", 10L, 1), (1, "B", 30L, 2))
    def at(us: Long) =
      Scd2.asOf(h, timestamp_micros(lit(us))).select("attr")
        .collect().map(_.getString(0)).toSeq
    assert(at(9L) === Seq())
    assert(at(10L) === Seq("A"))
    assert(at(29L) === Seq("A"))
    assert(at(30L) === Seq("B"))
    assert(at(999L) === Seq("B"))
  }

  test("applyChanges == full rebuild, including late out-of-order deltas") {
    val full = Seq(
      (1, "A", 10L, 1), (1, "B", 30L, 3), (1, "A", 20L, 2), // 20 is "late"
      (2, "X", 15L, 4), (2, "X", 25L, 5),
      (3, "Q", 11L, 6))
    val (base, delta) = (full.filterNot(r => Set(2, 5).contains(r._4)),
      full.filter(r => Set(2, 5).contains(r._4)))
    val applied = Scd2.applyChanges(hist(base: _*), log(delta: _*),
      Seq("k"), Seq("attr"), "ts", Seq("tie"))
    assert(asTuples(applied) === asTuples(hist(full: _*)))
    // untouched key 3 must survive verbatim
    assert(asTuples(applied).exists(_._1 == 3))
  }

  test("applyChanges law holds on cross-batch timestamp collisions") {
    val full = Seq((1, "A", 10L, 2), (1, "B", 10L, 1), (1, "C", 10L, 3))
    val (base, delta) = (full.filter(_._4 != 3), full.filter(_._4 == 3))
    val applied = Scd2.applyChanges(hist(base: _*), log(delta: _*),
      Seq("k"), Seq("attr"), "ts", Seq("tie"))
    assert(asTuples(applied) === asTuples(hist(full: _*)))
  }

  test("applyChanges is replay-idempotent") {
    val base = Seq((1, "A", 10L, 1), (1, "B", 30L, 2))
    val delta = Seq((1, "C", 40L, 3))
    val once = Scd2.applyChanges(hist(base: _*), log(delta: _*),
      Seq("k"), Seq("attr"), "ts", Seq("tie"))
    val twice = Scd2.applyChanges(once, log(delta: _*),
      Seq("k"), Seq("attr"), "ts", Seq("tie"))
    assert(asTuples(twice) === asTuples(once))
  }

  test("build refuses a column listed twice") {
    val e = intercept[IllegalArgumentException] {
      Scd2.build(log((1, "A", 10L, 1)), Seq("k"), Seq("k"), "ts", Nil)
    }
    assert(e.getMessage.contains("twice"))
  }

  test("build refuses input columns that collide with its output/internal names") {
    import spark.implicits._
    // an attr named valid_to would be silently overwritten by withColumn,
    // corrupting the history with no error — must refuse instead
    for (bad <- Seq("valid_from", "valid_to", "is_current", "_prev")) {
      val df = Seq((1, "A", 10L)).toDF("k", bad, "ts")
      val e = intercept[IllegalArgumentException] {
        Scd2.build(df, Seq("k"), Seq(bad), "ts", Nil)
      }
      assert(e.getMessage.contains("collide"), s"no loud refusal for $bad")
    }
  }

  test("gate runs on real events and matches the reference invariants") {
    val g = Scd2.scd2BuildGate(spark, sf)
    val rows = g.cache()
    assert(rows.count() > 0)
    // exactly one current row per user
    val multiCurrent = rows.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") > 1).count()
    assert(multiCurrent === 0)
    // intervals chain: every non-current valid_to equals SOME valid_from
    // of the same user (the lead construction guarantees it)
    val ends = rows.filter(!col("is_current"))
      .select(col("user_id"), col("valid_to").as("vf"))
    val starts = rows.select(col("user_id"), col("valid_from").as("vf"))
    assert(ends.except(starts).count() === 0)
    rows.unpersist()
    assert(Scd2.scd2AsOfGate(spark, sf).count() > 0)
  }

  test("scd2_apply gate: applyLog equals the full rebuild AND crosses the lossy boundary") {
    import graft.Tables
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val isDelta = pmod(xxhash64(col("event_id")), lit(5)) === 0
    val rawLog = ev.filter(!isDelta)
    val delta = ev.filter(isDelta)
    val keys = Seq("user_id"); val attrs = Seq("event_type")
    val full = Scd2.build(ev, keys, attrs, "ts", Seq("event_id"))
      .drop("event_id")
    val existing = Scd2.build(rawLog, keys, attrs, "ts", Seq("event_id"))
    val applied = Scd2.applyLog(rawLog, existing, delta,
      keys, attrs, "ts", Seq("event_id")).drop("event_id")
    // the law, Spark-side (the gate then certifies it cross-engine)
    assert(applied.exceptAll(full).isEmpty && full.exceptAll(applied).isEmpty)
    // the split must actually exercise applyChanges' lossy-collapse
    // boundary: the collapsed fold of the SAME delta must differ, or
    // the gate would be indistinguishable from a pure-append re-test
    val collapsed = Scd2.applyChanges(existing, delta,
      keys, attrs, "ts", Seq("event_id")).drop("event_id")
    assert(!collapsed.exceptAll(full).isEmpty || !full.exceptAll(collapsed).isEmpty,
      "hash split produced only boundary-safe deltas — gate no longer " +
        "exercises the lossy-collapse case; change the split")
  }

  test("plan: one key-partitioned window pass, never a global window") {
    val plan = Scd2.scd2BuildGate(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global exchange in SCD2 plan:\n$plan")
  }
}
