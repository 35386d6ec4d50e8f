package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 F1): media payloads are opaque
  * `binary` columns with typed metadata extracted alongside. The real
  * decode (image/audio libs) is stubbed — this container has none — but
  * the Spark-side schema, hashing, and metadata derivation are real and
  * oracle-checked. The deterministic fake "decode" derives dimensions
  * from the content hash, standing in for a decoder's header parse.
  */
object Multimodal {
  /** F1: binary payload + metadata extraction. */
  def mmBinaryMeta(spark: SparkSession, d: String): DataFrame = {
    val bin = col("text").cast("binary")
    Tables.documents(spark, d)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        sha2(bin, 256).as("sha256_hex"),
        (conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 512 + 1).as("fake_width"),
        (conv(substring(md5(col("text")), 5, 4), 16, 10).cast("long") % 512 + 1).as("fake_height"),
        (conv(substring(md5(col("text")), 9, 4), 16, 10).cast("long") % 16 + 1).as("fake_frames"))
      .orderBy(col("doc_id"))
  }

  val mmBinaryMetaSql: String =
    """SELECT doc_id,
      | strlen(text) AS n_bytes,
      | sha256(text) AS sha256_hex,
      | CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 512 + 1 AS fake_width,
      | CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 512 + 1 AS fake_height,
      | CAST('0x' || substr(md5(text), 9, 4) AS BIGINT) % 16 + 1 AS fake_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> mmBinaryMeta _)

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" -> mmBinaryMetaSql)
}
