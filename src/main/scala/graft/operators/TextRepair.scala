package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MojibakeExpr.fixMojibake

/** E37: encoding repair — the stage BEFORE the first text gate. Web
  * crawls carry a steady fraction of mojibake (UTF-8 bytes mis-decoded
  * as Latin-1/Windows-1252 somewhere upstream: "cafÃ©", "donâ€™t",
  * "â€” and â€¦ everywhere"), and every downstream signal misreads it —
  * tokenizers mint garbage types, language ID sees spurious
  * non-ASCII, dedup keys diverge for texts that are the same sentence.
  * ftfy (Speer 2019) is the published fix; [[fixMojibake]] is its
  * `fix_encoding` core as the repo's THIRD native codegen'd expression
  * (the StripAccents/VecDot precedent — a scalar UDF would box per row
  * and break whole-stage codegen for the chain this runs inside), with
  * the conservative all-or-nothing acceptance rule pinned in
  * MojibakeFunctions.scala: under-repair, never over-repair.
  *
  * Ordering contract with its neighbors, following ftfy's own
  * pipeline: repair runs BEFORE [[HtmlExtract]] only when entities
  * were double-corrupted, and always before [[TextNorm]] — the E34
  * key chain folds accents, so "cafÃ©" and "café" produce DIFFERENT
  * keys unless repair runs first ("cafÃ©" normalizes to "cafa©";
  * repaired first it is "café" → "cafe" — the spec pins this
  * composition).
  *
  * Scale shape: one row-local projection, zero exchange,
  * stream-transparent (the rule-gate convention). [[repairStats]] adds
  * one map-side-combinable global agg for the dataset-card counters.
  */
object TextRepair {

  /** The repair as a Column. */
  def fixedCol(c: Column): Column = fixMojibake(c)

  /** Every row back with `text_fixed` + `was_mojibake` (the routing
    * flag: repaired docs are the ones whose every downstream feature
    * just changed — a pipeline re-scoring only those pays O(repaired),
    * the flagged-join discipline). */
  def fixEncoding(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("text_fixed", fixedCol(col(textCol)))
      .withColumn("was_mojibake", col("text_fixed") =!= col(textCol))

  /** Corpus counters for the dataset card: docs repaired, docs still
    * carrying the classic markers after repair (double-encoded beyond
    * the 3-round cap, or mixed text the all-or-nothing rule vetoed —
    * the honest residue, counted not hidden), and total docs. */
  def repairStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val fixed = fixedCol(col(textCol))
    val marker = fixed.contains("Ã") || fixed.contains("â€") ||
      fixed.contains("ï¿½")
    docs.agg(
      count(lit(1)).as("n_docs"),
      sum(when(fixed =!= col(textCol), 1L).otherwise(0L)).as("n_repaired"),
      sum(when(marker, 1L).otherwise(0L)).as("n_residual_markers"))
  }

  // ---- gated harness entry ------------------------------------------------

  // The injected corruption set for the gate, spelled in escapes so no
  // editor/transcoding step can silently change the bytes under test:
  //   "Ã©"      = é (C3 A9) mis-decoded          → repairs to é
  //   "â€™"     = ’ (E2 80 99) mis-decoded       → ’   (cp1252 0x99 = ™)
  //   "â€”"     = — (E2 80 94) mis-decoded       → —   (cp1252 0x94 = ”)
  //   "Ã¯"      = ï (C3 AF) mis-decoded          → ï
  //   "ÃƒÂ©"    = é DOUBLE-mis-decoded (C3 83 C2 A9) → é in two rounds
  //   " déjà"   = GENUINE accents — vetoes the whole string (mixed rule)
  private val InjSingle = " caf\u00c3\u00a9 don\u00e2\u20ac\u2122t \u00e2\u20ac\u201d na\u00c3\u00afve"
  private val InjDouble = " \u00c3\u0192\u00c2\u00a9"
  private val InjGenuine = " d\u00e9j\u00e0"
  private val FixSingle = " caf\u00e9 don\u2019t \u2014 na\u00efve"
  private val FixDouble = " \u00e9"

  /** Gated harness entry (`repair_gate`): the repair ALGORITHM against
    * ground truth. The real corpus is pure ASCII (the E35 adjudication
    * — no corruption to repair), so the gate DERIVES it, the norm_clean
    * precedent: docs ≡0 mod 3 get the classic single-encoded sequences
    * appended, ≡2 mod 3 the double-encoded one (two fixpoint rounds),
    * and ≡0 mod 5 additionally a GENUINE accented word — which must
    * veto the whole string under the all-or-nothing mixed rule, even
    * when mojibake sits right next to it. Spark runs the full
    * byte-reversal algorithm; DuckDB — which has no Latin-1 transcode —
    * repairs by replacing exactly the INJECTED sequences and applies
    * the veto rule by CASE, so the algorithm's repairs, its fixpoint
    * iteration, and its veto all have to land on the independently
    * constructed expectation, byte for byte, across the whole corpus. */
  def repairGate(spark: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documentsSpread(spark, d).select(col("doc_id"), col("text"))
    val derived = docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(InjSingle)).otherwise(lit("")),
        when(col("doc_id") % 3 === 2, lit(InjDouble)).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(InjGenuine)).otherwise(lit("")))
        .as("text"))
    fixEncoding(derived).select(col("doc_id"), col("text_fixed"),
      col("was_mojibake"))
  }

  val repairGateSql: String =
    s"""WITH rows_ AS (
       |  SELECT doc_id, text
       |    || (CASE WHEN doc_id % 3 = 0 THEN '$InjSingle' ELSE '' END)
       |    || (CASE WHEN doc_id % 3 = 2 THEN '$InjDouble' ELSE '' END)
       |    || (CASE WHEN doc_id % 5 = 0 THEN '$InjGenuine' ELSE '' END) AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CASE WHEN doc_id % 5 = 0 THEN t
       |       ELSE replace(replace(t, '$InjDouble', '$FixDouble'),
       |                    '$InjSingle', '$FixSingle')
       |  END AS text_fixed,
       |  (doc_id % 5 <> 0 AND doc_id % 3 <> 1) AS was_mojibake
       |FROM rows_""".stripMargin

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("repair_gate" -> repairGate _)

  val oracles: Map[String, String] = Map(
    "repair_gate" -> repairGateSql)
}
