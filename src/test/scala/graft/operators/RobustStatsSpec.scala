package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** G25 robust stats: exact median/MAD arithmetic on constructed groups,
  * the modified z-score flag incl. the MAD=0 degenerate and null
  * visibility, and built-in percentile_disc parity on the real table. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def grp = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
    ("a", 5.0), ("a", 6.0), ("a", 7.0),
    ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0),
    ("c", 1.0), ("c", 2.0), ("c", 3.0), ("c", 4.0), ("c", 100.0)
  ).toDF("g", "v")

  test("medianMad: exact percentile_disc median and MAD per group") {
    val s = RobustStats.medianMad(grp, "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // a: 1..7 -> median 4 (rank 4 of 7), absdevs sorted {0,1,1,2,2,3,3} -> MAD 2
    assert(s("a") === ((7L, 4.0, 2.0)))
    // b: {5,5,5,9} -> median 5 (rank 2 of 4), absdevs {0,0,0,4} -> MAD 0
    assert(s("b") === ((4L, 5.0, 0.0)))
    // c: {1,2,3,4,100} -> median 3, absdevs sorted {0,1,1,2,97} -> MAD 1
    assert(s("c") === ((5L, 3.0, 1.0)))
  }

  test("outliers: the k*MAD gate, MAD=0 degenerate, null visibility") {
    val flagged = RobustStats.outliers(grp, "g", "v", k = 3.0)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getBoolean(r.fieldIndex("is_outlier"))).toMap
    // a: threshold 6 around 4 -> nothing flags
    Seq(1.0, 4.0, 7.0).foreach(v => assert(!flagged(("a", v)), s"a/$v"))
    // c: threshold 3 around 3 -> only the planted 100 flags
    assert(flagged(("c", 100.0)) && !flagged(("c", 4.0)) && !flagged(("c", 1.0)))
    // b: MAD = 0 degenerates to "every v != median flags" (documented)
    assert(flagged(("b", 9.0)))
    assert(!flagged(("b", 5.0)))

    // a null value is visible (NULL flag), never silently false
    val withNull = grp.unionByName(
      Seq(("a", Option.empty[Double])).toDF("g", "v"))
    val nullRow = RobustStats.outliers(withNull, "g", "v")
      .filter(col("v").isNull).collect()
    assert(nullRow.length === 1 &&
      nullRow.head.isNullAt(nullRow.head.fieldIndex("is_outlier")))
  }

  test("median/MAD match the built-in percentile_disc on the real events") {
    val ev = Tables.events(spark, sf)
    val ours = RobustStats.medianMad(ev, "event_type", "value")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val builtin = ev
      .groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours.keySet === builtin.keySet)
    ours.foreach { case (g, (m, mad)) =>
      assert(m === builtin(g), s"median of $g")
      assert(mad >= 0.0, s"mad of $g")
    }
    // the flag rate is sane on real data: outliers exist but are rare
    val flags = RobustStats.outliers(ev, "event_type", "value")
    val total = flags.count()
    val out = flags.filter(col("is_outlier")).count()
    assert(out >= 0 && out < total / 4, s"$out of $total flagged")
  }

  test("guards: non-positive k rejected") {
    intercept[IllegalArgumentException] {
      RobustStats.outliers(grp, "g", "v", k = 0.0) }
  }
}
