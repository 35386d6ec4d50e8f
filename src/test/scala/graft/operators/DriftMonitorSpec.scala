package graft.operators

import graft.{SparkSpec, Tables}
import graft.registry.{FeatureDef, FeatureStore, TableDef}
import org.apache.spark.sql.functions._

/** G22 feature drift monitoring: exact binning/alignment, the pinned
  * add-λ smoothing scored against a scalar reference, categorical
  * status semantics, and the store-bound version-over-version path. */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(0.0, 10.0, 20.0)

  test("histogram: exact counts incl. null bin, underflow and overflow") {
    val df = Seq[Option[Double]](
      Some(-5.0),            // below all edges -> bin 0
      Some(0.0), Some(9.9),  // [0,10)  -> bin 1
      Some(10.0),            // [10,20) -> bin 2 (left-closed: edge belongs up)
      Some(20.0), Some(99.0),// >= 20   -> bin 3
      None, None             // null    -> bin -1
    ).toDF("v")
    val h = DriftMonitor.histogram(df, "v", edges)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h === Map(-1 -> 2L, 0 -> 1L, 1 -> 2L, 2 -> 1L, 3 -> 2L))
  }

  test("numericDrift aligns bins full-outer with zero fill and exact bounds") {
    val ref = Seq(1.0, 2.0, 15.0).toDF("v")       // bins 1,1,2
    val cur = Seq(-3.0, 25.0, 26.0, 27.0).toDF("v") // bins 0,3,3,3
    val rows = DriftMonitor.numericDrift(ref, cur, "v", edges)
      .collect().map(r => (r.getInt(0),
        Option(r.get(1)), Option(r.get(2)), r.getLong(3), r.getLong(4))).toSet
    assert(rows === Set(
      (0, None, Some(0.0), 0L, 1L),          // underflow: open lower bound
      (1, Some(0.0), Some(10.0), 2L, 0L),
      (2, Some(10.0), Some(20.0), 1L, 0L),
      (3, Some(20.0), None, 0L, 3L)))        // overflow: open upper bound
  }

  test("driftSummary matches a scalar reference; identical inputs score 0") {
    val ev = Tables.events(spark, sf)
    val ref = ev.filter(col("event_type") === "view")
    val cur = ev.filter(col("event_type") === "purchase")
    val e10 = (0 to 10).map(_ * 50.0)
    val cmp = DriftMonitor.numericDrift(ref, cur, "value", e10)
    val s = DriftMonitor.driftSummary(cmp).collect()
    assert(s.length === 1)
    val row = s.head

    // scalar reference over the SAME comparison rows, same pinned rule
    val bins = cmp.select("ref_n", "cur_n").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val k = bins.length
    val (nr, nc) = (bins.map(_._1).sum, bins.map(_._2).sum)
    var psi, kl, tv, x2 = 0.0
    bins.foreach { case (a, b) =>
      val p = (a + 0.5) / (nr + 0.5 * k)
      val q = (b + 0.5) / (nc + 0.5 * k)
      psi += (p - q) * math.log(p / q)
      kl += p * math.log(p / q)
      tv += math.abs(a.toDouble / nr - b.toDouble / nc)
      val e = p * nc
      x2 += (b - e) * (b - e) / e
    }
    assert(row.getAs[Long]("n_ref") === nr && row.getAs[Long]("n_cur") === nc)
    assert(row.getAs[Long]("n_bins") === k.toLong)
    assert(math.abs(row.getAs[Double]("psi") - psi) < 1e-12)
    assert(math.abs(row.getAs[Double]("kl") - kl) < 1e-12)
    assert(math.abs(row.getAs[Double]("tvd") - tv / 2) < 1e-12)
    assert(math.abs(row.getAs[Double]("chi2") - x2) < 1e-9 * math.max(x2, 1.0))
    assert(psi > 0.0, "different populations must register drift")

    // a population compared against itself: p = q term-by-term, so every
    // score is EXACTLY zero — no float residue by construction
    val same = DriftMonitor.driftSummary(
      DriftMonitor.numericDrift(ref, ref, "value", e10)).collect().head
    assert(same.getAs[Double]("psi") === 0.0)
    assert(same.getAs[Double]("kl") === 0.0)
    assert(same.getAs[Double]("tvd") === 0.0)
  }

  test("categoricalDrift: status matrix, null category, empty-side scores") {
    val ref = Seq(Some("a"), Some("a"), Some("b"), None).toDF("c")
    val cur = Seq(Some("a"), Some("x"), Some("x"), None, None).toDF("c")
    val rows = DriftMonitor.categoricalDrift(ref, cur, "c")
      .collect().map(r => (Option(r.getString(0)),
        r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(rows === Set(
      (Some("a"), 2L, 1L, "common"),
      (Some("b"), 1L, 0L, "vanished"),
      (Some("x"), 0L, 2L, "novel"),
      (None, 1L, 2L, "common")))   // null rate shift is visible, not dropped

    // novel mass registers as drift through the same summary
    val s = DriftMonitor.driftSummary(
      DriftMonitor.categoricalDrift(ref, cur, "c")).collect().head
    assert(s.getAs[Double]("psi") > 0.0 && s.getAs[Double]("chi2") > 0.0)

    // an empty side yields NULL scores (fail-visible), exact totals intact
    val s2 = DriftMonitor.driftSummary(
      DriftMonitor.categoricalDrift(ref, cur.filter(lit(false)), "c"))
      .collect().head
    assert(s2.getAs[Long]("n_cur") === 0L && s2.isNullAt(s2.fieldIndex("psi")))
  }

  test("featureDrift compares two materialized versions out of the store") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val fs = new FeatureStore(spark, s"$dir/values")
    fs.registerTable(TableDef("orders", Seq("o_custkey", "o_totalprice"),
      Map("o_totalprice" -> "numeric")), Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    // v2 sees a doubled distribution — unambiguous upward drift
    fs.defineFeature(FeatureDef("spend2", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg((sum("o_totalprice") * 2).as("value"))))
    assert(fs.computeVersion("spend", "v1").isRight)
    assert(fs.computeVersion("spend", "v2").isRight)

    val same = DriftMonitor.featureDrift(fs, "spend", "v1", "v2", nBins = 8)
    assert(same.isRight)
    val sSame = DriftMonitor.driftSummary(same.toOption.get).collect().head
    assert(sSame.getAs[Double]("psi") === 0.0, "identical recompute: no drift")

    // drifted current: compare v1 against the doubled feature's values by
    // FREEZING v1's edges (the monitoring convention the scaladoc pins)
    assert(fs.computeVersion("spend2", "v1").isRight)
    val refVals = fs.versionValues("spend", "v1").toOption.get
    val curVals = fs.versionValues("spend2", "v1").toOption.get
    val frozen = DriftMonitor.equiWidthEdges(refVals, "value", 8)
    val drift = DriftMonitor.driftSummary(
      DriftMonitor.numericDrift(refVals, curVals, "value", frozen))
      .collect().head
    assert(drift.getAs[Double]("psi") > 0.25, "doubling is actionable drift")

    // unknown version fails loudly
    assert(DriftMonitor.featureDrift(fs, "spend", "v1", "v9").isLeft)
    assert(DriftMonitor.featureDrift(fs, "ghost", "v1", "v2").isLeft)
  }

  test("ksStatistic: exact CDF gap, zero on self, null mass excluded") {
    val ref = (Seq.fill(5)(1.0) ++ Seq.fill(5)(15.0)).toDF("v")   // bins 1,2
    val cur = (Seq.fill(5)(15.0) ++ Seq.fill(5)(25.0)).toDF("v")  // bins 2,3
    val ks = DriftMonitor.ksStatistic(
      DriftMonitor.numericDrift(ref, cur, "v", edges))
    assert(ks === Some(0.5), s"CDF gap .5 after bin 1: $ks")
    // identical populations: exact zero
    assert(DriftMonitor.ksStatistic(
      DriftMonitor.numericDrift(ref, ref, "v", edges)) === Some(0.0))
    // null rows on one side do not perturb the CDF comparison
    val refN = ref.unionByName(Seq(Option.empty[Double]).toDF("v"))
    assert(DriftMonitor.ksStatistic(
      DriftMonitor.numericDrift(refN, cur, "v", edges)) === Some(0.5))
    // an empty side cannot be scored
    assert(DriftMonitor.ksStatistic(
      DriftMonitor.numericDrift(ref, cur.filter(lit(false)), "v", edges))
      .isEmpty)
  }

  test("plan shape: histogram map-side combines; no window, no corpus cartesian") {
    val ev = Tables.events(spark, sf)
    val e10 = (0 to 10).map(_ * 50.0)
    val hist = DriftMonitor.histogram(ev, "value", e10)
      .queryExecution.executedPlan.toString
    // partial + final aggregate levels and nothing heavier
    assert("HashAggregate".r.findAllMatchIn(hist).size >= 2, hist)
    assert(!hist.contains("Window") && !hist.contains("CartesianProduct"), hist)
    // the full comparison plans only bin-keyed work on the corpus side;
    // the sole nested-loop join is the bins-sized 1-row summary cross
    val cmp = DriftMonitor.numericDrift(ev, ev, "value", e10)
      .queryExecution.executedPlan.toString
    assert(!cmp.contains("CartesianProduct"), cmp)
    assert(!cmp.contains("Window"), cmp)
  }

  test("edge guards and equiWidthEdges derivation") {
    intercept[IllegalArgumentException] {
      DriftMonitor.histogram(Seq(1.0).toDF("v"), "v", Seq.empty) }
    intercept[IllegalArgumentException] {
      DriftMonitor.histogram(Seq(1.0).toDF("v"), "v", Seq(1.0, 1.0)) }
    val e = DriftMonitor.equiWidthEdges(Seq(0.0, 100.0).toDF("v"), "v", 4)
    assert(e === Seq(0.0, 25.0, 50.0, 75.0, 100.0))
    // constant column degenerates to the single edge {min}
    assert(DriftMonitor.equiWidthEdges(Seq(7.0, 7.0).toDF("v"), "v", 4) === Seq(7.0))
    intercept[IllegalArgumentException] {
      DriftMonitor.equiWidthEdges(Seq[Option[Double]](None).toDF("v"), "v", 4) }
  }
}
