package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Canonical physical-plan fingerprint (r17 directive 2): the r15/r16
  * verdicts adjudicated bench regressions on diff-identical code as
  * "probably host variance" twice — with a fingerprint per key in the
  * committed bench artifact, the call becomes decidable from
  * artifacts: same fingerprint = host variance (no action), changed
  * fingerprint = plan drift (investigate). The hash is over the
  * FORMATTED physical explain with everything incidental normalized
  * away — expression ids, plan ids, scan paths/locations, and every
  * digit run (partition counts, statistics, scale-dependent sizes) —
  * so the same code produces the same fingerprint across sessions,
  * shuffle-partition settings, and scale factors, while any STRUCTURAL
  * change (operator added/removed, join strategy flipped, a pushed
  * filter appearing/disappearing, exchange moved) changes it. Stated
  * limit of the digit normalization (review wave 2, r17): a
  * constant-ONLY change (a filter threshold 10 → 99, a limit, a
  * parameter) keeps the same fingerprint by design — scale-invariance
  * requires erasing digits, and a constant change is a code change the
  * round diff itself shows; the fingerprint adjudicates the
  * diff-identical case, where no such change exists. Computing it
  * PLANS the query but never executes it (query construction itself
  * may materialize anchored intermediates — that is the construction's
  * cost, not this hash's). */
object PlanFingerprint {

  private[bench] def normalize(explain: String): String = explain
    .replaceAll("#\\d+", "#") // expression ids
    .replaceAll("(?i)file:[^\\s,\\]\\)}]*", "<path>") // scan paths
    .replaceAll("Location: .*", "Location: <loc>")
    .replaceAll("\\d+", "N") // partition counts, sizes, plan ids

  def of(df: DataFrame): String = {
    val txt = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(normalize(txt).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }
}
