package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-shaped aggregations for corpus-scale frequency work (SURVEY §2
  * G12) — the scale companions to the exact E12/E13 oracle queries.
  *
  * `topKHeavyHitters` is the 100 TB form of a corpus-wide top-k: the
  * full-corpus shuffle carries an 8-byte xxhash64 instead of the gram
  * string (3-gram strings average ~25 bytes here and can be arbitrarily
  * long in real corpora), and strings are resolved + exactly recounted
  * only for the candidate hashes. Candidates are EVERY hash whose count
  * reaches the k-th largest hash count — not a fixed 2k cut — because
  * the deterministic (count desc, value asc) tie-break needs all values
  * tied at the boundary count, and a hash-ordered cut would drop an
  * arbitrary subset of a tie group (measured: k=20 inside a ~50-way tie
  * at count 6 on this corpus). Hash counts dominate true counts
  * (collisions only merge), so every true top-k value's hash clears the
  * threshold; the result is identical to the direct string-keyed top-k
  * unless an xxhash64 collision lands exactly on the boundary
  * (P ≈ m²/2⁶⁴ — negligible), and the reported counts are always exact
  * because phase 2 recounts by the true string. On a degenerate corpus
  * where most counts tie at the boundary the candidate set degrades
  * toward the full vocabulary — Zipf-shaped data keeps it ~k.
  */
object SketchOps {

  /** Top-k most frequent values of `valueCol` with exact counts,
    * hash-first: phase 1 counts 8-byte hashes and thresholds at the k-th
    * largest hash count (boundary ties all survive); phase 2 recounts
    * the candidate rows by true value and takes the final k with the
    * (count desc, value asc) deterministic tie-break. */
  def topKHeavyHitters(rows: DataFrame, valueCol: String, k: Int): DataFrame = {
    val hashCounts = rows
      .groupBy(xxhash64(col(valueCol)).as("gh"))
      .agg(count(lit(1)).as("hn"))
    val kth = hashCounts.orderBy(col("hn").desc).limit(k)
      .agg(min(col("hn")).as("c_k"))
    val candidates = hashCounts.crossJoin(broadcast(kth))
      .filter(col("hn") >= col("c_k"))
      .select("gh")
    rows.join(broadcast(candidates),
        xxhash64(col(valueCol)) === col("gh"))
      .groupBy(col(valueCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(valueCol))
      .limit(k)
  }

  /** HyperLogLog++ distinct-count of `valueCol` next to the exact count
    * of a sibling exact query — the O(1)-memory path for vocabulary
    * cardinality at corpus scale (exact distinct shuffles every distinct
    * value; the sketch shuffles one ~1.5/rsd² register set). */
  def approxDistinct(rows: DataFrame, valueCol: String, rsd: Double = 0.02): DataFrame =
    rows.agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))
}
