package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** 100 TB-scale n-gram near-dup detection.
  *
  * The exact operator (dedup_ngram_jaccard) joins on every shingle; its
  * cost is Σ df(shingle)², which a handful of stop-shingles dominates at
  * corpus scale. Here candidate generation drops shingles with document
  * frequency above `maxDf` (they carry almost no Jaccard evidence:
  * a pair at threshold t shares ≥ t/(1+t) of its shingles, so for any
  * realistic threshold most shared shingles are rare) and exact Jaccard
  * is then recomputed over ALL shingles for just the candidates — the
  * approximation only risks missing a pair whose every shared shingle is
  * hot; the verification step never admits a false positive.
  */
object NgramDedup {
  /** @param shingled (id, shingle) relation, distinct per doc */
  def scalablePairs(shingled: DataFrame, id: String, threshold: Double,
      maxDf: Int = 1000): DataFrame = {
    val rare = shingled.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
      .select("shingle")
    val blocked = shingled.join(rare, Seq("shingle"), "left_semi")
    val candidates = blocked.select(col(id).as("id_a"), col("shingle"))
      .join(blocked.select(col(id).as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    MinHashLsh.verifiedPairs(shingled, id, candidates, threshold)
  }
}
