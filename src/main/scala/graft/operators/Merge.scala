package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE — the keyed-table upsert/CDC-apply verb (Delta/Iceberg
  * `MERGE INTO`, re-expressed as declarative Spark plans so Catalyst
  * plans the join; the physical table-format commit lives behind
  * [[graft.registry.ValueStoreFormat.merge]]).
  *
  * Three verbs, one semantics family:
  *  - [[upsert]]: matched keys take the update row, unmatched target
  *    rows survive, unmatched update rows insert. The backfill-
  *    correction primitive.
  *  - [[changeSet]]: the MINIMAL change feed between two snapshots —
  *    `_op=upsert` rows (payload = the new row) for added/changed
  *    keys, `_op=delete` rows (key only) for removed keys. Shares the
  *    G24 SnapshotDiff status rule; where diff REPORTS, changeSet
  *    CARRIES.
  *  - [[applyChanges]]: apply a change feed to a snapshot. The
  *    round-trip law (spec-pinned):
  *    `applyChanges(old, changeSet(old, cur, k), k) ≡ cur` — a diff
  *    shipped to a replica reproduces the source exactly.
  *
  * Keys must be UNIQUE in the updates/changes frame — a duplicate
  * update key makes MERGE ambiguous, and the operator raises inside
  * the plan (the SnapshotDiff convention; Delta throws the same way)
  * instead of silently fanning out. Target-side duplicates of a
  * MATCHED key collapse to the single update row (this is a
  * keyed-table merge, not a positional UPDATE); unmatched target rows
  * pass through untouched, duplicates and all.
  *
  * Scale: one shuffled `left_anti` join on the key plus a union — the
  * provable minimum for a merge (every target row must learn whether
  * its key was touched). The updates side is usually deltas — orders
  * of magnitude smaller — and AQE broadcasts it when it fits, making
  * the anti-join shuffle-free on the target. `changeSet` is ONE
  * full-outer join (the SnapshotDiff shape) carrying the cur-side
  * payload; `byHash = true` collapses the old side's compared columns
  * to one xxhash64 before the shuffle (the 100 TB mode, same
  * documented 2⁻⁶⁴ one-sided collision class: a collision drops a
  * changed row from the feed — reports it unchanged — never corrupts
  * one).
  */
object Merge {

  /** Updates frame with a loud in-plan duplicate-key guard: any key
    * appearing twice raises before a single merged row is emitted. */
  private def guarded(updates: DataFrame, key: String,
      cols: Seq[String]): DataFrame =
    updates
      .select(col(key).as("_k"), struct(cols.map(col): _*).as("_row"))
      .groupBy("_k")
      .agg(count(lit(1)).as("_n"), first(col("_row")).as("_row"))
      .select(when(col("_n") > 1, raise_error(concat(
          lit("duplicate update key in MERGE: "),
          col("_k").cast("string"))))
        .otherwise(col("_row")).as("_row"))
      .select(cols.map(c => col(s"_row.$c").as(c)): _*)

  /** Keyed upsert: `updates` rows win on their keys; every other
    * target row survives. Schemas must carry the same column set. */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = target.columns.toSeq
    require(cols.contains(key), s"key '$key' not in target columns")
    require(updates.columns.toSet == cols.toSet,
      s"updates columns ${updates.columns.toSeq} must match target $cols")
    val u = guarded(updates, key, cols)
    u.unionByName(target.join(u.select(key), Seq(key), "left_anti")
      .select(cols.map(col): _*))
  }

  /** Apply a change feed (`opCol` ∈ upsert|delete) to a keyed
    * snapshot: delete rows remove their key, upsert rows merge as
    * [[upsert]]. Unknown ops raise inside the plan. */
  def applyChanges(target: DataFrame, changes: DataFrame, key: String,
      opCol: String = "_op"): DataFrame = {
    val cols = target.columns.toSeq
    require(changes.columns.toSet == cols.toSet + opCol,
      s"changes must carry target columns $cols plus '$opCol', got " +
        changes.columns.toSeq.toString)
    val checked = changes.withColumn(opCol,
      when(col(opCol).isin("upsert", "delete"), col(opCol))
        .otherwise(raise_error(concat(lit("unknown MERGE op: "),
          coalesce(col(opCol), lit("null"))))))
    // guard key uniqueness across the WHOLE feed (an upsert and a
    // delete of one key in one batch is ambiguous too)
    val g = guarded(checked, key, cols :+ opCol)
    val ups = g.filter(col(opCol) === "upsert").drop(opCol)
      .select(cols.map(col): _*)
    ups.unionByName(
      target.join(g.select(key), Seq(key), "left_anti")
        .select(cols.map(col): _*))
  }

  /** Minimal change feed turning `old` into `cur`: upserts for
    * added/changed keys (payload = cur's row), deletes for removed
    * keys (non-key columns null). `compare` defaults to all shared
    * non-key columns; `byHash` trades exact comparison for an 8-byte
    * shuffle per old row (doc-class collision: a changed row may be
    * OMITTED from the feed, never emitted wrong). Both sides carry
    * the SnapshotDiff duplicate-key guard. */
  def changeSet(old: DataFrame, cur: DataFrame, key: String,
      compare: Seq[String] = Nil, byHash: Boolean = false): DataFrame = {
    val outCols = cur.columns.toSeq
    require(outCols.contains(key), s"key '$key' not in cur columns")
    val cols =
      if (compare.nonEmpty) compare
      else outCols.filter(c => c != key && old.columns.contains(c))
    require(cols.nonEmpty, s"no columns to compare besides the key '$key'")
    def content(c: Seq[String]): Column = {
      val s = struct(c.map(col): _*)
      if (byHash) xxhash64(to_json(s)) else s
    }
    def side(df: DataFrame, tag: String, payload: Option[Seq[String]]) = {
      val base = df.select(col(key).as("_k"),
        content(cols).as("_c"),
        payload.map(p => struct(p.map(col): _*))
          .getOrElse(lit(null)).as("_p"))
        .groupBy("_k")
        .agg(count(lit(1)).as("_n"), first(col("_c")).as(s"_c_$tag"),
          first(col("_p")).as("_p"))
      base.select(col("_k"),
        when(col("_n") > 1, raise_error(concat(
            lit(s"duplicate key in $tag snapshot: "),
            col("_k").cast("string"))))
          .otherwise(col(s"_c_$tag")).as(s"_c_$tag"),
        col("_p").as(s"_p_$tag"), lit(true).as(s"_in_$tag"))
    }
    val nonKey = outCols.filter(_ != key)
    val joined = side(old, "old", None)
      .join(side(cur, "cur", Some(nonKey)), Seq("_k"), "full_outer")
    joined
      .withColumn("_op",
        when(col("_in_cur").isNull, "delete")
          .when(col("_in_old").isNull ||
            !(col("_c_old") <=> col("_c_cur")), "upsert"))
      .filter(col("_op").isNotNull)
      .select((col("_k").as(key) +:
        nonKey.map(c => col(s"_p_cur.$c").as(c)) :+ col("_op")): _*)
  }

  // ---- gated harness entry -------------------------------------------------

  /** Gated entry (`merge_upsert`): the upsert rule against ground
    * truth — target = documents missing the ≡2-mod-7 keys, updates =
    * patched rows for ≡0-mod-3 keys (some matching, some inserting).
    * DuckDB re-derives it as updates ∪ (target anti-join updates). */
  def mergeUpsert(spark: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "text", "lang")
    val target = docs.filter(col("doc_id") % 7 =!= 2)
    val updates = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("text", concat(col("text"), lit(" [patched]")))
    upsert(target, updates, "doc_id")
  }

  val mergeUpsertSql: String =
    """WITH t AS (
      |  SELECT doc_id, text, lang FROM documents WHERE doc_id % 7 <> 2),
      |u AS (
      |  SELECT doc_id, text || ' [patched]' AS text, lang
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id, text, lang FROM u
      |UNION ALL
      |SELECT t.doc_id, t.text, t.lang FROM t
      |WHERE t.doc_id NOT IN (SELECT doc_id FROM u)""".stripMargin

  /** Gated entry (`change_set`): the CDC-feed rule against ground
    * truth — the snap_diff snapshots (every status occurs), exact
    * comparison mode so DuckDB re-derives the feed with its own full
    * outer join: upserts carry cur's row, deletes carry the key with a
    * NULL payload, unchanged keys are absent. */
  def changeSetGate(spark: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
    val old = docs.filter(col("doc_id") % 7 =!= 2)
    val cur = docs.filter(col("doc_id") % 7 =!= 1)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
    changeSet(old, cur, "doc_id").withColumnRenamed("_op", "op")
  }

  val changeSetSql: String =
    """WITH old AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 2),
      |cur AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 1)
      |SELECT coalesce(old.doc_id, cur.doc_id) AS doc_id,
      |  cur.text AS text,
      |  CASE WHEN cur.doc_id IS NULL THEN 'delete' ELSE 'upsert' END AS op
      |FROM old FULL OUTER JOIN cur ON old.doc_id = cur.doc_id
      |WHERE cur.doc_id IS NULL OR old.doc_id IS NULL
      |   OR old.text IS DISTINCT FROM cur.text""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "merge_upsert" -> mergeUpsert _,
    "change_set" -> changeSetGate _)

  val oracles: Map[String, String] = Map(
    "merge_upsert" -> mergeUpsertSql,
    "change_set" -> changeSetSql)
}
