package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized invariants for the G37 round-trip law and the B38 AUC
  * identity — seeded trials over adversarial shapes (timestamp
  * collisions, no-op runs, late deltas) that hand-written cases
  * under-sample. */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815)

  private def randomLog(nKeys: Int, nRows: Int) =
    Seq.fill(nRows)((
      rnd.nextInt(nKeys).toLong,            // key
      s"s${rnd.nextInt(3)}",                // attr from a SMALL state space
      (rnd.nextInt(20) * 1000L),            // ts with heavy collisions
      rnd.nextLong().abs))                  // unique-ish tie

  private def hist(rows: Seq[(Long, String, Long, Long)]) =
    Scd2.build(rows.toDF("k", "attr", "us", "tie")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us"),
      Seq("k"), Seq("attr"), "ts", Seq("tie"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("attr"), col("tie"),
        unix_micros(col("valid_from")),
        coalesce(unix_micros(col("valid_to")), lit(-1L)), col("is_current"))
      .collect().map(_.toSeq).toSet

  private def asDf(rows: Seq[(Long, String, Long, Long)]) =
    rows.toDF("k", "attr", "us", "tie")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")

  test("applyChanges == full rebuild over 20 random PURE-APPEND splits", graft.Slow) {
    // the exact-law regime: every delta row sorts after the key's base
    // rows, so no delta lands inside a collapsed no-op run
    for (trial <- 1 to 20) {
      val full = randomLog(nKeys = 4, nRows = 30)
      val cut = 10000L
      val base = full.filter(_._3 < cut)
      val delta = full.filter(_._3 >= cut)
      if (base.nonEmpty && delta.nonEmpty) {
        val applied = Scd2.applyChanges(hist(base), asDf(delta),
          Seq("k"), Seq("attr"), "ts", Seq("tie"))
        assert(canon(applied) === canon(hist(full)),
          s"trial $trial diverged (base=${base.size}, delta=${delta.size})")
      }
    }
  }

  test("applyChanges self-consistency law holds on ARBITRARY random splits") {
    // unconditional invariant: the result equals a full build over
    // (existing versions as a log) ∪ delta — what the collapsed
    // history can and does guarantee for any interleaving
    for (trial <- 1 to 15) {
      val full = randomLog(nKeys = 4, nRows = 30)
      val mask = full.map(_ => rnd.nextBoolean())
      val base = full.zip(mask).collect { case (r, true) => r }
      val delta = full.zip(mask).collect { case (r, false) => r }
      if (base.nonEmpty && delta.nonEmpty) {
        val h = hist(base)
        val applied = Scd2.applyChanges(h, asDf(delta),
          Seq("k"), Seq("attr"), "ts", Seq("tie"))
        val hLog = h.select(col("k"), col("attr"), col("tie"),
          col("valid_from").as("ts"))
        val expected = Scd2.build(hLog.unionByName(
            asDf(delta).select("k", "attr", "tie", "ts")),
          Seq("k"), Seq("attr"), "ts", Seq("tie"))
        assert(canon(applied) === canon(expected), s"trial $trial")
      }
    }
  }

  test("applyLog is exact on the lossy-collapse counterexample AND random splits") {
    val base = Seq((1L, "s2", 4000L, 1L), (1L, "s2", 7000L, 2L))
    val delta = Seq((1L, "s1", 6000L, 3L))
    val applied = Scd2.applyLog(asDf(base), hist(base), asDf(delta),
      Seq("k"), Seq("attr"), "ts", Seq("tie"))
    assert(canon(applied) === canon(hist(base ++ delta)))
    for (trial <- 1 to 10) {
      val full = randomLog(nKeys = 4, nRows = 30)
      val mask = full.map(_ => rnd.nextBoolean())
      val b = full.zip(mask).collect { case (r, true) => r }
      val d = full.zip(mask).collect { case (r, false) => r }
      if (b.nonEmpty && d.nonEmpty) {
        val got = Scd2.applyLog(asDf(b), hist(b), asDf(d),
          Seq("k"), Seq("attr"), "ts", Seq("tie"))
        assert(canon(got) === canon(hist(full)), s"trial $trial")
      }
    }
  }

  test("the documented lossy-collapse case behaves exactly as stated") {
    // log s2@4, s2@7 collapses; late s1@6 cannot resurrect the dropped
    // re-observation — applyChanges yields s2[4,6) s1[6,∞) while a raw
    // full rebuild yields s2[4,6) s1[6,7) s2[7,∞)
    val base = Seq((1L, "s2", 4000L, 1L), (1L, "s2", 7000L, 2L))
    val delta = Seq((1L, "s1", 6000L, 3L))
    val applied = Scd2.applyChanges(hist(base), asDf(delta),
      Seq("k"), Seq("attr"), "ts", Seq("tie"))
      .orderBy("valid_from").collect()
      .map(r => (r.getString(1), r.getBoolean(5)))
    assert(applied.toSeq === Seq(("s2", false), ("s1", true)))
    val full = hist(base ++ delta).orderBy("valid_from").collect()
      .map(r => (r.getString(1), r.getBoolean(5)))
    assert(full.toSeq === Seq(("s2", false), ("s1", false), ("s2", true)))
  }

  test("AUC identity == brute-force pair counting over 15 random scorings") {
    for (trial <- 1 to 15) {
      val rows = Seq.fill(40)((rnd.nextInt(6).toDouble, rnd.nextBoolean()))
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        val won = (for (p <- pos; n <- neg) yield
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        val expected = won / (pos.size.toDouble * neg.size.toDouble)
        val got = ModelEval.auc(rows.toDF("s", "y"), "s", "y", 4)
          .collect().head.getDouble(3)
        assert(math.abs(got - expected) < 1e-12,
          s"trial $trial: got $got expected $expected")
      }
    }
  }
}
