package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E41: compression-ratio quality signal — the Dolma/RefinedWeb heuristic
  * the rule-gate family (E11/E27/E28) doesn't cover: zlib-deflate the
  * UTF-8 text and score `compressed_bytes / raw_bytes`. Highly
  * repetitive boilerplate compresses to a tiny fraction (ratio ≪ the
  * prose band) and high-entropy garbage (base64 blobs, minified JS,
  * binary-in-text) barely compresses at all (ratio ≈ 1), so ONE signal
  * fences both failure modes the n-gram repetition rules and the
  * quality classifier each only half-see.
  *
  * Determinism: java.util.zip.Deflater with a PINNED level (9) and the
  * default strategy over UTF-8 bytes — same input, same JVM zlib, same
  * output length; the spec pins known strings. (Not oracle-gated:
  * DuckDB has no deflate — the signal is spec-gated like the tokenizer
  * family.)
  *
  * Scale: row-local mapPartitions with ONE reused Deflater + output
  * buffer per partition (a per-row Deflater would allocate a native
  * zlib stream per document); no shuffle, the signal rides the scan.
  */
object CompressionSignal {

  /** Pinned deflate level — changing it changes every score; it is part
    * of the signal's identity, like a tokenizer vocabulary. */
  val Level = 9

  /** Adds (n_bytes, n_compressed, compress_ratio) to `df`. Empty text
    * pins ratio NULL (0/0 is undefined, and an empty doc is a length
    * rule's job, not a compressibility signal); NULL text propagates
    * NULL everywhere. */
  def score(df: DataFrame, textCol: String): DataFrame = {
    val schema = df.schema
      .add("n_bytes", LongType)
      .add("n_compressed", LongType)
      .add("compress_ratio", DoubleType)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      val deflater = new java.util.zip.Deflater(Level)
      var buf = new Array[Byte](1 << 16)
      it.map { r =>
        if (r.isNullAt(idx))
          Row.fromSeq(r.toSeq ++ Seq[Any](null, null, null))
        else {
          val bytes = r.getString(idx).getBytes("UTF-8")
          if (bytes.isEmpty)
            Row.fromSeq(r.toSeq ++ Seq[Any](0L, 0L, null))
          else {
            deflater.reset()
            deflater.setInput(bytes)
            deflater.finish()
            var total = 0L
            while (!deflater.finished()) {
              val n = deflater.deflate(buf)
              if (n == 0 && !deflater.finished()) {
                // defensive: grow if zlib stalls on a full buffer
                buf = new Array[Byte](buf.length * 2)
              } else total += n
            }
            // Seq[Any] deliberately: a Seq(Long, Long, Double) literal
            // numeric-widens every element to Double and corrupts the
            // BIGINT fields at encode time
            Row.fromSeq(r.toSeq ++ Seq[Any](bytes.length.toLong, total,
              total.toDouble / bytes.length.toDouble))
          }
        }
      }
    }(enc)
  }

  /** Verdict form for gate composition (the C4Filters fail-closed
    * convention): keep = ratio inside [minRatio, maxRatio]; NULL ratio
    * (empty/null text) FAILS CLOSED. Default band per the published
    * heuristics: < 0.30 ≈ machine-repetitive, > 0.95 ≈ high-entropy
    * non-text. */
  def gate(df: DataFrame, textCol: String,
           minRatio: Double = 0.30, maxRatio: Double = 0.95): DataFrame =
    score(df, textCol).withColumn("compress_keep",
      coalesce(col("compress_ratio").between(minRatio, maxRatio), lit(false)))
}
