package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G24: snapshot diff — row-level reconciliation of two versions of a
  * keyed table (yesterday's corpus vs today's refresh, value-store
  * version N vs N+1, a vendor drop vs the last one). Dataset
  * versioning's first question is "what actually changed?", and the
  * operator answers it per key: `added` (new key), `removed` (gone),
  * `changed` (key survived, compared content differs), `unchanged`.
  * This is the data-shaped complement of G22: drift scores say the
  * DISTRIBUTION moved, diff says WHICH ROWS moved — and its summary is
  * the churn line a dataset card reports between releases.
  *
  * Comparison semantics are null-safe struct equality over the named
  * `compare` columns (`<=>` per column — a NULL never makes a row
  * incomparable, and NULL → value transitions count as changes). Keys
  * must be unique per side (the operator asserts it loudly per
  * partition — a duplicate key would silently fan out the join and
  * fabricate diff rows).
  *
  * Scale: ONE full-outer shuffled hash join on the key — the provable
  * minimum for a reconciliation. By default the compared columns ride
  * the shuffle; `byHash = true` collapses them to ONE xxhash64 per
  * side before the join (8 bytes instead of document-width rows —
  * the 100 TB mode), trading the repo's standard one-sided collision
  * class: a 2⁻⁶⁴ hash collision reports `unchanged` for a changed
  * row, never the reverse (false change is impossible either way).
  * The gated query runs the exact mode, so the oracle pins the
  * status rule itself; the hash mode is spec-pinned equal on the
  * real corpus.
  */
object SnapshotDiff {

  private def contentCol(compare: Seq[String], byHash: Boolean): Column = {
    val s = struct(compare.map(col): _*)
    if (byHash) xxhash64(to_json(s)) else s
  }

  /** Per-key diff: (key, status) for every key present in either
    * snapshot. `compare` defaults to all shared non-key columns. */
  def diff(old: DataFrame, cur: DataFrame, key: String,
      compare: Seq[String] = Nil, byHash: Boolean = false): DataFrame = {
    val cols =
      if (compare.nonEmpty) compare
      else old.columns.toSeq.filter(c => c != key && cur.columns.contains(c))
    require(cols.nonEmpty, s"no columns to compare besides the key '$key'")
    def side(df: DataFrame, tag: String): DataFrame =
      // one keyed aggregate per side: it carries the content AND the
      // loud duplicate-key guard (a dup would fan out the full-outer
      // join and fabricate diff rows), and it pre-partitions both
      // sides on _k so the join below reuses the partitioning instead
      // of shuffling a third time
      df.select(col(key).as("_k"), contentCol(cols, byHash).as("_c"))
        .groupBy("_k")
        .agg(count(lit(1)).as("_n"), first(col("_c")).as(s"_c_$tag"))
        .select(col("_k"),
          when(col("_n") > 1, raise_error(concat(
              lit(s"duplicate key in $tag snapshot: "),
              col("_k").cast("string"))))
            .otherwise(col(s"_c_$tag")).as(s"_c_$tag"),
          lit(true).as(s"_in_$tag"))
    side(old, "old").join(side(cur, "cur"), Seq("_k"), "full_outer")
      .select(col("_k").as(key),
        when(col("_in_old").isNull, "added")
          .when(col("_in_cur").isNull, "removed")
          .when(col("_c_old") <=> col("_c_cur"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Release-note churn line: one row per status with count — plus the
    * derived churn fraction over the CURRENT snapshot ((added +
    * changed) / |cur|), the number a dataset card quotes. */
  def diffSummary(d: DataFrame): DataFrame = {
    val counts = d.groupBy("status").agg(count(lit(1)).as("n"))
    val tot = counts.agg(
      sum(when(col("status") =!= "removed", col("n"))).as("_n_cur"),
      sum(when(col("status").isin("added", "changed"), col("n")))
        .as("_n_churn"))
    counts.join(broadcast(tot))
      .select(col("status"), col("n"),
        (coalesce(col("_n_churn"), lit(0L)) /
          coalesce(col("_n_cur"), lit(1L))).as("churn_frac"))
  }

  // ---- gated harness entry -------------------------------------------------

  /** Gated entry (`snap_diff`): the status rule against ground truth —
    * two snapshots derived from `documents` so every status occurs
    * (keys ≡ 1 mod 7 exist only in old → removed; ≡ 2 mod 7 only in
    * cur → added; ≡ 0 mod 5 of the survivors carry edited text →
    * changed; the rest unchanged). Exact mode: the text itself rides
    * the comparison, so DuckDB re-derives statuses with its own full
    * outer join and string equality — no hash convention in the gate. */
  def snapDiff(spark: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
    val old = docs.filter(col("doc_id") % 7 =!= 2)
    val cur = docs.filter(col("doc_id") % 7 =!= 1)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
    diff(old, cur, "doc_id", Seq("text"))
  }

  val snapDiffSql: String =
    """WITH old AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 2),
      |cur AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 1)
      |SELECT coalesce(old.doc_id, cur.doc_id) AS doc_id,
      |  CASE WHEN old.doc_id IS NULL THEN 'added'
      |       WHEN cur.doc_id IS NULL THEN 'removed'
      |       WHEN old.text IS NOT DISTINCT FROM cur.text THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |FROM old FULL OUTER JOIN cur ON old.doc_id = cur.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "snap_diff" -> snapDiff _)

  val oracles: Map[String, String] = Map(
    "snap_diff" -> snapDiffSql)
}
