package graft.operators

import graft.SparkSpec

/** G22 mathematical invariants over randomized bin-count comparisons
  * (seeded trials — deterministic, rerunnable): the smoothing rule
  * turns both sides into proper probability distributions, so the
  * information-theoretic bounds must hold on EVERY input, not just the
  * constructed fixtures:
  *
  *   psi ≥ 0 (Jeffreys divergence = KL(p‖q) + KL(q‖p))
  *   kl  ≥ 0 (Gibbs' inequality)
  *   tvd ∈ [0, 1], chi² ≥ 0, ks ∈ [0, 1]
  *   psi and tvd symmetric under swapping ref/cur; kl generally NOT
  *   (asymmetry exercised, not assumed away)
  */
class DriftInvariantsSpec extends SparkSpec {
  import spark.implicits._

  private def comparison(refN: Seq[Long], curN: Seq[Long]) =
    refN.indices.map(i => (i, refN(i), curN(i)))
      .toDF("bin", "ref_n", "cur_n")

  test("information-theoretic bounds hold on randomized comparisons") {
    val rnd = new scala.util.Random(20260814L)
    var sawAsymmetricKl = false
    (1 to 15).foreach { trial =>
      val k = 2 + rnd.nextInt(8)
      // skewed magnitudes + forced zeros: the regimes that break naive
      // (unsmoothed) implementations
      def counts() = Seq.fill(k)(
        if (rnd.nextInt(4) == 0) 0L else rnd.nextInt(1 << rnd.nextInt(16)).toLong)
      var (a, b) = (counts(), counts())
      if (a.sum == 0) a = a.updated(0, 7L)
      if (b.sum == 0) b = b.updated(0, 3L)

      val f = DriftMonitor.driftSummary(comparison(a, b)).collect().head
      val (psi, kl, tvd, chi2) = (f.getAs[Double]("psi"), f.getAs[Double]("kl"),
        f.getAs[Double]("tvd"), f.getAs[Double]("chi2"))
      assert(psi >= -1e-15, s"trial $trial: psi $psi < 0 on a=$a b=$b")
      assert(kl >= -1e-15, s"trial $trial: kl $kl < 0")
      assert(tvd >= 0.0 && tvd <= 1.0 + 1e-15, s"trial $trial: tvd $tvd")
      assert(chi2 >= 0.0, s"trial $trial: chi2 $chi2")

      val r = DriftMonitor.driftSummary(comparison(b, a)).collect().head
      assert(math.abs(psi - r.getAs[Double]("psi")) < 1e-12,
        s"trial $trial: psi must be symmetric")
      assert(math.abs(tvd - r.getAs[Double]("tvd")) < 1e-12,
        s"trial $trial: tvd must be symmetric")
      if (math.abs(kl - r.getAs[Double]("kl")) > 1e-9) sawAsymmetricKl = true

      val ks = DriftMonitor.ksStatistic(comparison(a, b))
      val ksSwap = DriftMonitor.ksStatistic(comparison(b, a))
      assert(ks.exists(v => v >= 0.0 && v <= 1.0 + 1e-15), s"trial $trial: ks $ks")
      assert(ks.zip(ksSwap).forall { case (x, y) => math.abs(x - y) < 1e-12 },
        s"trial $trial: ks must be symmetric")
    }
    assert(sawAsymmetricKl,
      "trials never exercised KL's asymmetry — generator too tame")
  }

  test("psi separates: more mass displacement, larger score") {
    // move mass progressively from bin 0 to bin 3 and require monotone psi
    val base = Seq(400L, 300L, 200L, 100L)
    val scores = (0 to 4).map { shift =>
      val moved = Seq(400L - 80 * shift, 300L, 200L, 100L + 80 * shift)
      DriftMonitor.driftSummary(comparison(base, moved))
        .collect().head.getAs[Double]("psi")
    }
    assert(scores.head === 0.0)
    scores.sliding(2).foreach { case Seq(x, y) =>
      assert(y > x, s"psi must grow with displacement: $scores") }
  }
}
