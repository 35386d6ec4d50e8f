package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Gated harness entry. The synthetic corpus carries no crawl URLs,
    * so the query derives one deterministically from columns it does
    * have — `https://<source>.example.com/<lang>/<doc_id>` — and runs
    * the full three-rule gate against fixed literal lists chosen to
    * exercise every verdict path on this corpus: a domain block
    * (src3), a block overridden by the allowlist (src7), a strict-ban
    * word (lang `de` at weight 1.0) and an accumulating pair (source
    * `src5` + lang `fr` at 0.5 each, blocking only together). The
    * DuckDB oracle recomputes host, suffix match, distinct-run word
    * score and the keep rule independently from the same columns —
    * every weight a small power of two, so the score sum is bit-exact
    * in any addition order. */
  def urlGate(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("url", concat(lit("https://"), col("source"),
        lit(".example.com/"), col("lang"), lit("/"),
        col("doc_id").cast("string")))
    val bl = Seq("src3.example.com", "src7.example.com").toDF("domain")
    val al = Seq("src7.example.com").toDF("domain")
    val ww = Seq(("de", 1.0), ("src5", 0.5), ("fr", 0.5))
      .toDF("word", "weight")
    filterUrls(docs, bl, ww, al)
      .select(col("doc_id"), col("host"), col("blocked_domain"),
        col("url_score"), col("allowed_domain"), col("keep"))
  }

  val urlGateSql: String =
    """SELECT doc_id,
      |  source || '.example.com' AS host,
      |  CASE WHEN source IN ('src3', 'src7')
      |       THEN source || '.example.com' END AS blocked_domain,
      |  CAST(CASE WHEN lang = 'de' THEN 1.0 ELSE 0.0 END
      |     + CASE WHEN source = 'src5' THEN 0.5 ELSE 0.0 END
      |     + CASE WHEN lang = 'fr' THEN 0.5 ELSE 0.0 END
      |       AS DOUBLE) AS url_score,
      |  CASE WHEN source = 'src7'
      |       THEN 'src7.example.com' END AS allowed_domain,
      |  (source = 'src7') OR (source NOT IN ('src3', 'src7')
      |    AND (CASE WHEN lang = 'de' THEN 1.0 ELSE 0.0 END
      |       + CASE WHEN source = 'src5' THEN 0.5 ELSE 0.0 END
      |       + CASE WHEN lang = 'fr' THEN 0.5 ELSE 0.0 END) < 1.0) AS keep
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "url_gate" -> urlGate _)

  val oracles: Map[String, String] = Map(
    "url_gate" -> urlGateSql)
}
