package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MinHashLshSpec extends SparkSpec {
  private def shingled = Tables.documents(spark, sf)
    .filter(size(split(col("text"), " ")) >= 3)
    .select(col("doc_id"), explode(array_distinct(expr(
      """transform(sequence(0, size(split(text, ' ')) - 3),
        |  i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], split(text, ' ')[i+2]))"""
        .stripMargin))).as("shingle"))

  test("LSH candidates contain every true high-jaccard pair (recall)") {
    val sh = shingled.cache()
    val sigs = MinHashLsh.signatures(sh, "doc_id", numHashes = 8)
    val cands = MinHashLsh.candidatePairs(sigs, "doc_id", numHashes = 8, bands = 4)
    val verified = MinHashLsh.verifiedPairs(sh, "doc_id", cands, threshold = 0.8)

    // ground truth: exact all-pairs jaccard >= 0.8 (small SF only)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val truth = sh.select(col("doc_id").as("id_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
      .join(sz.select(col("doc_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sz.select(col("doc_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .filter(col("common").cast("double") / (col("n_a") + col("n_b") - col("common")) >= 0.8)
      .select("id_a", "id_b")

    val missed = truth.except(verified.select("id_a", "id_b")).count()
    assert(missed === 0, "LSH with 4 bands of 2 must catch all >=0.8 pairs here")
    // and verification must never pass a below-threshold pair
    assert(verified.filter(col("jaccard") < 0.8).count() === 0)
  }

  test("candidate generation is far smaller than the cross product") {
    val sh = shingled
    val n = Tables.documents(spark, sf).count()
    val sigs = MinHashLsh.signatures(sh, "doc_id", 8)
    val cands = MinHashLsh.candidatePairs(sigs, "doc_id", 8, 4).count()
    assert(cands < n * (n - 1) / 4, s"candidates $cands should prune the ${n * (n - 1) / 2} cross product")
  }
}
