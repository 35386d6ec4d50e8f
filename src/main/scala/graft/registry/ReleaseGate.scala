package graft.registry

import graft.operators.{DriftMonitor, SnapshotDiff}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G26: Write-Audit-Publish for dataset refreshes — the release
  * discipline the lakehouse world publishes as WAP (write the
  * candidate aside, AUDIT it against the live snapshot, publish only
  * on pass): a refresh pipeline that publishes whatever it produced
  * will eventually publish the run where an upstream extractor
  * silently broke and 40% of the corpus vanished. The gate makes
  * "does this refresh look like a refresh, or like an incident?" a
  * CHECKED question, composed from the engine's own audit surfaces —
  * nothing here re-implements a rule:
  *
  *   - CHURN bounds ([[graft.operators.SnapshotDiff]]): added+changed
  *     over |cur| and removed over |old| each under a frozen maximum —
  *     the two directions fail differently (a feed replay inflates
  *     churn; a broken extractor inflates removals) so they bound
  *     separately.
  *   - EXPECTATION rules ([[Expectations]]): the candidate itself must
  *     be clean — one conditional-aggregation scan for all rules.
  *   - DRIFT bound ([[graft.operators.DriftMonitor]], optional): PSI of
  *     a named numeric column against the OLD snapshot under frozen
  *     edges — a refresh can be row-wise plausible and still move the
  *     distribution a training consumer depends on.
  *   - CATEGORICAL bound (optional): PSI over a category column's mix
  *     plus a NOVEL-CATEGORY mass bound — the fraction of candidate
  *     rows whose category the published snapshot never saw, the
  *     schema-drift signal a single PSI understates when novel mass
  *     spreads over many small categories.
  *
  * The verdict is fail-closed and EVIDENCE-CARRYING: `audit` returns
  * every reason that failed (never just the first — re-running a 100 TB
  * audit to learn the second failure is the expensive path) plus the
  * measured numbers, so a rejected release is a diagnosis, not a
  * boolean. Publishing itself stays the caller's move (the value-store
  * formats and ModelStore already own atomic commit); the gate is the
  * audit step those commits should sit behind.
  *
  * Scale: one diff (two keyed aggregates + one keyed join), one
  * expectations scan, two histogram scans when the drift bound is on —
  * each individually audited in its own operator; the gate adds only
  * driver-side arithmetic on their bounded outputs.
  */
object ReleaseGate {

  /** The measured evidence, pass or fail. `psi`/`catPsi`/`novelFrac`
    * are None when the corresponding bound was not requested (or the
    * column had no comparable data — which itself fails closed). */
  final case class Audit(
      nOld: Long, nCur: Long,
      added: Long, removed: Long, changed: Long, unchanged: Long,
      churnFrac: Double, removedFrac: Double,
      expectationViolations: Map[String, Long],
      psi: Option[Double],
      catPsi: Option[Double],
      novelFrac: Option[Double],
      failures: List[String],
      embPsi: Option[Double] = None,
      embShift: Option[Double] = None) {
    def publishable: Boolean = failures.isEmpty
  }

  /** Audit a candidate refresh against the published snapshot. Bounds
    * are inclusive (a churn exactly at the max passes — the bound is a
    * budget, not a strict envelope). `driftOn` names a numeric column
    * to PSI-bound with edges frozen from the OLD snapshot. `embOn`
    * names an embedding column (array<float>) to bound with the G32
    * cluster-then-compare scores — centroids are k-means-trained on
    * the OLD snapshot at audit time (the same freeze-from-old
    * convention as the edges; a deployment with a long-lived baseline
    * runs [[graft.operators.EmbeddingDrift]] against its durable
    * reference directly), list-mass PSI bounded by `maxEmbPsi` and the
    * mass-weighted centroid shift by `maxEmbShift`. */
  def audit(old: DataFrame, cur: DataFrame, key: String,
      compare: Seq[String] = Nil,
      maxChurnFrac: Double = 0.2, maxRemovedFrac: Double = 0.05,
      rules: Seq[Expectations.Rule] = Nil,
      driftOn: Option[String] = None, maxPsi: Double = 0.25,
      driftBins: Int = 10, byHash: Boolean = false,
      catDriftOn: Option[String] = None, maxCatPsi: Double = 0.25,
      maxNovelFrac: Double = 1.0,
      embOn: Option[String] = None, maxEmbPsi: Double = 0.25,
      maxEmbShift: Double = 0.5, embNlist: Int = 16): Audit = {
    require(maxChurnFrac >= 0 && maxRemovedFrac >= 0 && maxPsi >= 0 &&
      maxCatPsi >= 0 && maxNovelFrac >= 0 && maxEmbPsi >= 0 &&
      maxEmbShift >= 0, "bounds must be non-negative")

    val statuses = SnapshotDiff.diff(old, cur, key, compare, byHash)
      .groupBy("status").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)
    val (added, removed, changed, unchanged) = (statuses("added"),
      statuses("removed"), statuses("changed"), statuses("unchanged"))
    val nOld = removed + changed + unchanged
    val nCur = added + changed + unchanged
    val churnFrac =
      if (nCur == 0) 1.0 else (added + changed).toDouble / nCur
    val removedFrac =
      if (nOld == 0) 0.0 else removed.toDouble / nOld

    val report =
      if (rules.isEmpty) Expectations.Report(nCur, Map.empty)
      else Expectations.check(cur, rules)

    // data conditions (empty old side, all-null column) fail CLOSED via
    // the could-not-score path rather than throwing out of the audit
    val psi = driftOn.map { c =>
      scala.util.Try {
        val edges = DriftMonitor.equiWidthEdges(old, c, driftBins)
        DriftMonitor.driftSummary(
            DriftMonitor.numericDrift(old, cur, c, edges))
          .collect().headOption
          .flatMap(r => Option(r.getAs[java.lang.Double]("psi")))
          .map(_.doubleValue)
      }.toOption.flatten
    }

    // categorical bound: PSI over the category mix, plus the fraction
    // of cur rows carrying a category the old snapshot never saw — the
    // schema-drift-in-data signal a binned PSI can understate when the
    // novel mass spreads over many small categories
    val catScores = catDriftOn.map { c =>
      scala.util.Try {
        val cmp = DriftMonitor.categoricalDrift(old, cur, c)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val s = DriftMonitor.driftSummary(cmp).collect().headOption
          val psiC = s.flatMap(r => Option(r.getAs[java.lang.Double]("psi")))
            .map(_.doubleValue)
          val agg = cmp.agg(
            sum(when(col("status") === "novel", col("cur_n"))).as("_nov"),
            sum(col("cur_n")).as("_nc")).collect().head
          val novel =
            if (agg.isNullAt(1) || agg.getLong(1) == 0L) None
            else Some(Option(agg.get(0)).fold(0.0)(_ =>
              agg.getLong(0).toDouble / agg.getLong(1)))
          (psiC, novel)
        } finally cmp.unpersist()
      }.toOption.getOrElse((None, None))
    }

    // embedding bound (G32 composition): centroids frozen from OLD at
    // audit time; an unscorable column fails closed like the others
    val embScores: Option[(Option[Double], Option[Double])] = embOn.map { c =>
      scala.util.Try {
        val refV = old.select(col(key).as("id"), col(c).as("embedding"))
          .filter(col("embedding").isNotNull)
        val curV = cur.select(col(key).as("id"), col(c).as("embedding"))
          .filter(col("embedding").isNotNull)
        val cents = graft.operators.IvfSearch.train(refV, embNlist)
        val s = graft.operators.EmbeddingDrift.score(refV, curV, cents)
          .collect().headOption
        (s.flatMap(r => Option(r.getAs[java.lang.Double]("psi")))
           .map(_.doubleValue),
         s.flatMap(r => Option(r.getAs[java.lang.Double]("wmean_shift")))
           .map(_.doubleValue))
      }.toOption.getOrElse((None, None))
    }

    val failures = List(
      (if (nCur == 0)
        Some(s"candidate snapshot is empty (old had $nOld keys)") else None),
      (if (churnFrac > maxChurnFrac)
        Some(f"churn $churnFrac%.4f (added=$added changed=$changed of $nCur) exceeds max $maxChurnFrac%.4f")
      else None),
      (if (removedFrac > maxRemovedFrac)
        Some(f"removals $removedFrac%.4f ($removed of $nOld) exceed max $maxRemovedFrac%.4f")
      else None)) .flatten ++
      report.violations.collect { case (rule, n) if n > 0 =>
        s"expectation $rule violated by $n rows" }.toList.sorted ++
      (psi match {
        case Some(Some(p)) if p > maxPsi =>
          List(f"drift psi $p%.4f on '${driftOn.get}' exceeds max $maxPsi%.4f")
        case Some(None) =>
          List(s"drift bound on '${driftOn.get}' could not be scored " +
            "(no comparable non-null data) — fail closed")
        case _ => Nil
      }) ++
      (catScores match {
        case Some((None, _)) =>
          List(s"categorical drift bound on '${catDriftOn.get}' could not " +
            "be scored (an empty side) — fail closed")
        case Some((Some(p), nov)) =>
          (if (p > maxCatPsi)
            List(f"categorical psi $p%.4f on '${catDriftOn.get}' exceeds max $maxCatPsi%.4f")
          else Nil) ++
          (nov match {
            case Some(nf) if nf > maxNovelFrac =>
              List(f"novel-category mass $nf%.4f on '${catDriftOn.get}' exceeds max $maxNovelFrac%.4f")
            case _ => Nil
          })
        case None => Nil
      }) ++
      (embScores match {
        case Some((None, _)) =>
          List(s"embedding drift bound on '${embOn.get}' could not be " +
            "scored (no comparable vectors) — fail closed")
        case Some((Some(p), sh)) =>
          (if (p > maxEmbPsi)
            List(f"embedding list-mass psi $p%.4f on '${embOn.get}' " +
              f"exceeds max $maxEmbPsi%.4f")
          else Nil) ++
          (sh match {
            case Some(s) if s > maxEmbShift =>
              List(f"embedding centroid shift $s%.4f on '${embOn.get}' " +
                f"exceeds max $maxEmbShift%.4f")
            case _ => Nil
          })
        case None => Nil
      })

    Audit(nOld, nCur, added, removed, changed, unchanged,
      churnFrac, removedFrac, report.violations,
      psi.flatten, catScores.flatMap(_._1), catScores.flatMap(_._2),
      failures,
      embPsi = embScores.flatMap(_._1), embShift = embScores.flatMap(_._2))
  }
}
