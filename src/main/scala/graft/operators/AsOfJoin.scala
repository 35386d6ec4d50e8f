package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized as-of (point-in-time) join — the feature-store primitive
  * behind training-set assembly: for each probe row, the most recent
  * build-side value at or before the probe time, per entity.
  *
  * Implementation is the union-sort trick rather than a per-row range
  * probe: tag both inputs, union, sort each entity partition once by
  * (time, side, seq), and carry the last build value forward with
  * `last(ignoreNulls)`. Cost is one shuffle of probe+build by entity and
  * a per-partition sort — no join fan-out, no range condition, no skewed
  * nested loop; exactly how a 1000-executor cluster wants it. Ties at
  * identical timestamps resolve build-before-probe, then by `seqCol`
  * (largest wins), matching `ORDER BY ts DESC, seq DESC LIMIT 1`.
  */
object AsOfJoin {
  /** @param probe  rows needing a value (entityCol, timeCol, payload...)
    * @param build  rows providing values (entityCol, timeCol, seqCol, valueCols...)
    * @return probe columns + each build valueCol as `asof_<name>` (inner
    *         semantics: probe rows with no prior build row are dropped) */
  def asOf(probe: DataFrame, build: DataFrame, entityCol: String,
      timeCol: String, seqCol: String, valueCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns
    val pTagged = probe
      .withColumn("_side", lit(0))
      .withColumn("_seq", lit(null).cast("long"))
    val bTagged = valueCols.foldLeft(
      build.withColumn("_side", lit(1)).withColumn("_seq", col(seqCol).cast("long")))(
      (df, c) => df.withColumnRenamed(c, s"_v_$c"))
    val allCols = (pTagged.columns ++ bTagged.columns).distinct
    def conform(df: DataFrame) =
      df.select(allCols.map(c =>
        if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)
    // build rows (_side=1) sort before probe rows at the same timestamp
    // so a probe at t sees a build value stamped exactly t
    val w2 = Window.partitionBy(col(entityCol))
      .orderBy(col(timeCol), col("_side").desc, col("_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(conform(bTagged).unionByName(conform(pTagged)))(
      (df, c) => df.withColumn(s"asof_$c", last(col(s"_v_$c"), ignoreNulls = true).over(w2)))
    carried.filter(col("_side") === 0 && valueCols.map(c => col(s"asof_$c").isNotNull).reduce(_ && _))
      .select(probeCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }

  /** Gated entry (`asof_join`, r12 s3): the generic operator against
    * DuckDB's LATERAL re-derivation — each view event picks up the
    * value of the user's most recent purchase at or before it (the
    * documented tie rule `ORDER BY ts DESC, seq DESC LIMIT 1` stated
    * literally in the oracle; values pass through untouched, so the
    * comparison is carry-exact, no arithmetic to pin). The A7
    * feat_pit_join gate covers the feature-store composition; this
    * gates the primitive itself. */
  def asofJoinGate(spark: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(spark, d)
    val probe = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val build = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("seq"),
        col("value"))
    asOf(probe, build, "user_id", "ts", "seq", Seq("value"))
      .orderBy(col("event_id"))
  }

  val asofJoinSql: String =
    """WITH probe AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
      |build AS (
      |  SELECT user_id, ts, event_id AS seq, value FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ts, b.value AS asof_value
      |FROM probe p JOIN LATERAL (
      |  SELECT value FROM build b
      |  WHERE b.user_id = p.user_id AND b.ts <= p.ts
      |  ORDER BY b.ts DESC, b.seq DESC LIMIT 1) b ON TRUE
      |ORDER BY p.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> asofJoinGate _)

  val oracles: Map[String, String] = Map(
    "asof_join" -> asofJoinSql)
}
