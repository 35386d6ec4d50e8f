package graft.operators

import graft.Tables
import org.apache.spark.sql.graft.VecDot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-modal feature assembly (SURVEY §2 F3): join the text table with
  * its embedding table on the shared id and derive a joint quality
  * signal — the pattern a multimodal training-data pipeline uses to
  * combine per-modality scores before filtering. Equi-join on the id, so
  * at scale both sides shuffle-by-id once (or co-bucketed: zero shuffle).
  */
object CrossModal {
  def mmJointFeatures(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"))
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), VecDot.vecNorm(col("embedding")).as("emb_norm"),
        col("label"))
    docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("n_tokens"), col("emb_norm"), col("label"),
        (least(lit(1.0), col("n_tokens") / lit(100.0)) * col("emb_norm")).as("joint_score"))
      .orderBy(col("doc_id"))
  }

  val mmJointFeaturesSql: String =
    """SELECT doc_id, n_tokens, emb_norm, label,
      | least(1.0, n_tokens / 100.0) * emb_norm AS joint_score
      |FROM (
      |  SELECT d.doc_id, len(string_split(d.text, ' ')) AS n_tokens, e.label,
      |    sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS emb_norm
      |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_joint_features" -> mmJointFeatures _)
  val oracles: Map[String, String] = Map(
    "mm_joint_features" -> mmJointFeaturesSql)
}
