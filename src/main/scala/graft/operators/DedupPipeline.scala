package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data deduplication pipeline — the single
  * entry point a corpus-curation job calls (previously this composition
  * lived only in the stress harness). Standard order, standard reasons:
  *
  *  1. EXACT dedup first (md5 hash-groupBy): web-scale corpora are
  *     mostly byte-identical copies; collapsing them first means the
  *     quadratic-ish near-dup stage never pays pair cost inside exact
  *     groups.
  *  2. NEAR-DUP candidate pairs over the exact representatives only
  *     ([[NgramDedup.scalablePairs]]: df-capped shingle blocking, exact
  *     Jaccard verification — never all-pairs).
  *  3. Connected components over the verified pairs
  *     ([[DedupClusters.connectedComponents]]: keyed min-label
  *     propagation).
  *  4. One representative per cluster: the minimum doc id. Exact-group
  *     members inherit their representative's cluster, so `cluster_id`
  *     is the global minimum id of the merged exact+near cluster and
  *     `keep` is true for exactly that one document.
  *
  * Every input row comes back labeled — dropping rows would hide the
  * dedup rate; downstream filters on `keep`.
  */
object DedupPipeline {

  /** (id, cluster_id, keep) for every input document. */
  def dedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, maxDf: Int = 1000): DataFrame = {
    val id = col(idCol)
    // 1. exact groups -> per-doc exact representative (min id)
    val hashed = docs.select(id, col(textCol), md5(col(textCol)).as("_h"))
    val exactRep = hashed.groupBy(col("_h")).agg(min(id).as("_rep"))
    val mapped = hashed.join(exactRep, Seq("_h"))
      .select(id, col(textCol), col("_rep"))
    // 2. shingle the representatives only
    val reps = mapped.filter(id === col("_rep")).select(id, col(textCol))
    val shingled = reps
      .select(id, split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(id, explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
    val pairs = NgramDedup.scalablePairs(shingled, idCol, threshold, maxDf)
    // 3. near-dup components over representatives
    val comps = DedupClusters.connectedComponents(pairs, "id_a", "id_b")
    // 4. docs inherit their representative's component; min-label CC
    // means cluster_id is the global min id of the merged cluster
    mapped.join(comps, mapped("_rep") === comps("id"), "left")
      .select(id, coalesce(col("comp"), col("_rep")).as("cluster_id"))
      .withColumn("keep", id === col("cluster_id"))
  }
}
