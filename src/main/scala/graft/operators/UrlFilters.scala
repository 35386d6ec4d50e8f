package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level filtering — the FIRST gate of the published web-curation
  * stacks, upstream of every text rule: RefinedWeb opens with URL
  * filtering by a domain blocklist plus word-scored URLs (Penedo et
  * al. 2023 §3.1 and Appendix G.1, explicitly "before undergoing any
  * processing"; C4 and MassiveText carry equivalent source-level
  * blocks). The reference repo has no crawl surface at all
  * (main.py:37-340 serves precomputed features), so like the rest of
  * the curation family this is engine-added.
  *
  * Three rules, all data-driven (lists are FRAMES, not code — the
  * mixture-recipe/C4-blocklist convention):
  *  - DOMAIN BLOCK: the URL's host, or any registered suffix of it,
  *    appears in the blocklist (`b.example.com` is blocked by
  *    `example.com` — subdomains inherit their parent's verdict; the
  *    reverse never holds).
  *  - URL-WORD SCORE: words found in the URL carry weights; a URL
  *    whose summed weight reaches `scoreThreshold` blocks. Words match
  *    on maximal ALPHANUMERIC RUNS of the lowercased URL, never
  *    substrings — "sex" does not fire inside "essex" (the C4Filters
  *    Scunthorpe note; RefinedWeb's curated word lists exist for
  *    exactly this failure). A strict ban is a word whose weight ≥
  *    threshold.
  *  - ALLOWLIST OVERRIDE: a host suffix-matching the allowlist keeps
  *    the row regardless of the other two rules (RefinedWeb excludes
  *    curated high-quality domains from the blocklists).
  *
  * Scale shape: host/word extraction is row-local; each rule is one
  * equi-join of the exploded key stream against its list — suffix
  * candidates are bounded by the host's label count (≤ `maxLabels`),
  * words by URL length. Lists broadcast by default; `broadcastLists =
  * false` drops the hint for multi-million-domain blocklists past
  * broadcast size (the E22/E23 convention — the size-based planner
  * shuffles, identical output, spec'd). The corpus pays exactly ONE
  * keyed join-back: the three rules' outputs — each bounded by ACTUAL
  * matches, the LineDedup flagged-join discipline — fold into one
  * verdict frame of one row per flagged url before they touch the
  * corpus again.
  *
  * Every input row comes back labeled (the C4Filters convention):
  * (input columns..., host, blocked_domain, url_score, allowed_domain,
  * keep). Null/empty/hostless URLs fail CLOSED (keep = false,
  * null host) — an unparseable address is not evidence of quality.
  *
  * Streaming: a verdict depends only on the row and the frozen lists,
  * but the implementation aggregates matches per doc before the
  * join-back, so the operator is NOT literally stream-transparent (a
  * streaming aggregation would drag in a state store for state that is
  * semantically per-row). The honest online shape is `foreachBatch`
  * running THIS operator per micro-batch — the StreamingModelGate
  * argument: zero cross-batch state, structural batch/online parity.
  */
object UrlFilters {

  /** Lowercased host of `url`: strips scheme (any `x://`), userinfo,
    * port, path/query/fragment. Null when nothing host-shaped remains.
    * The scheme/userinfo groups are POSSESSIVE (`?+`): a matched
    * scheme is never given back, so `https:///path` (scheme, empty
    * authority) yields null instead of backtracking into host =
    * "https" — the fail-closed parse the spec pins. */
  private def hostOf(url: Column): Column = {
    val h = regexp_extract(lower(url),
      "^(?:[a-z][a-z0-9+.-]*://)?+(?:[^/?#@]*@)?+([^/?#:]+)", 1)
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /** Apply the three URL rules. `blocklist`/`allowlist` are one-column
    * (`domain`) frames of lowercased domains; `urlWords` is (word,
    * weight) with positive weights. Any list may be empty (the rule
    * then never fires). */
  def filterUrls(docs: DataFrame, blocklist: DataFrame,
      urlWords: DataFrame, allowlist: DataFrame,
      scoreThreshold: Double = 1.0, idCol: String = "doc_id",
      urlCol: String = "url", maxLabels: Int = 10,
      broadcastLists: Boolean = true): DataFrame = {
    require(scoreThreshold > 0, s"scoreThreshold $scoreThreshold must be > 0")
    require(maxLabels >= 1, s"maxLabels $maxLabels must be >= 1")
    require(docs.columns.contains(idCol) && docs.columns.contains(urlCol),
      s"docs needs ($idCol, $urlCol)")
    def listed(df: DataFrame, cols: Column*): DataFrame = {
      val p = df.select(cols: _*)
      if (broadcastLists) broadcast(p) else p
    }
    val bl = listed(blocklist, col("domain"))
    val al = listed(allowlist, col("domain").as("a_domain"))
    val ww = listed(urlWords, col("word"), col("weight").cast("double"))

    // host extraction is row-local on the OUTPUT frame itself — no
    // corpus self-join to re-attach it
    val withHost = docs
      .withColumn("_u", lower(col(urlCol)))
      .withColumn("host", hostOf(col("_u")))

    // suffix candidates: host a.b.c -> [c, b.c, a.b.c], generated from
    // the TLD END so the `maxLabels` cap sacrifices only
    // pathologically-deep full hosts, never the registered domain a
    // blocklist actually names (capping from the full-host end would
    // skip exactly the suffixes blocklists consist of). The explode is
    // per-URL label-count-sized, never corpus²
    val withSuffixes = withHost.filter(col("host").isNotNull)
      .select(col(idCol),
        explode(expr(
          s"""transform(sequence(1, least(size(split(host, '[.]')),
             |  $maxLabels)),
             |  len -> array_join(slice(split(host, '[.]'),
             |    size(split(host, '[.]')) - len + 1, len), '.'))""".stripMargin))
          .as("_suffix"))
    val blockedByDomain = withSuffixes
      .join(bl, col("_suffix") === col("domain"))
      .groupBy(col(idCol))
      .agg(min(col("domain")).as("blocked_domain"))
    val allowedByDomain = withSuffixes
      .join(al, col("_suffix") === col("a_domain"))
      .groupBy(col(idCol))
      .agg(min(col("a_domain")).as("allowed_domain"))

    // word score: maximal alnum runs of the WHOLE url (host + path +
    // query all carry signal, per the paper), distinct per url so a
    // repeated word counts once
    val words = withHost
      .select(col(idCol),
        explode(array_distinct(filter(
          split(col("_u"), "[^a-z0-9]+"), w => length(w) > 0))).as("word"))
    val scores = words.join(ww, Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("weight")).as("url_score"))

    // fold the three rule outputs — each bounded by ACTUAL matches, the
    // LineDedup flagged-join discipline — into ONE verdict frame, so
    // the corpus pays a single keyed join-back, not three
    val verdicts = blockedByDomain
      .join(scores, Seq(idCol), "full_outer")
      .join(allowedByDomain, Seq(idCol), "full_outer")

    withHost
      .join(verdicts, Seq(idCol), "left")
      .drop("_u")
      .withColumn("url_score", coalesce(col("url_score"), lit(0.0)))
      .withColumn("keep",
        col("host").isNotNull && (col("allowed_domain").isNotNull ||
          (col("blocked_domain").isNull &&
            col("url_score") < scoreThreshold)))
  }
}
