package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** C5 scale path: Similarity.lshNearDupPairs (LSH-bucketed candidates +
  * exact cosine verify) against the quarantined all-pairs oracle form on
  * the REAL embeddings table. Plane signs are md5-seeded, so the result
  * is deterministic — the equality assertion is stable, not flaky. */
class LshNearDupSpec extends SparkSpec {

  test("LSH near-dup pairs match the exact all-pairs form at threshold 0.45") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val lsh = Similarity.lshNearDupPairs(vecs, "vec_id", dims = 64, threshold = 0.45)
    val exact = Dedup.dedupEmbedCos(spark, sf)
    // exact verification admits no false positive, ever
    assert(lsh.select("id_a", "id_b").except(exact.select("id_a", "id_b")).count() === 0,
      "LSH path admitted a pair the exact form rejects")
    // recall on this corpus at the default 24x4 sketch: complete
    val missed = exact.select("id_a", "id_b").except(lsh.select("id_a", "id_b"))
    assert(missed.count() === 0,
      s"sketch missed true pairs: ${missed.collect().mkString(", ")}")
    // the verified cosine is the SAME exact computation as the oracle form
    val joined = lsh.withColumnRenamed("cos", "cos_lsh")
      .join(exact, Seq("id_a", "id_b"))
    assert(joined.filter(col("cos_lsh") =!= col("cos")).count() === 0,
      "verification cosine diverged from the oracle computation")
  }

  test("candidate generation is bucketed: no cartesian, cells carry ids only") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val p = Similarity.lshNearDupPairs(vecs, "vec_id", dims = 64, threshold = 0.45)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup candidates degenerated to all-pairs:\n$p")
  }

  test("fewer tables trade recall, never precision") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val small = Similarity.lshNearDupPairs(vecs, "vec_id", dims = 64,
      threshold = 0.45, tables = 2)
    val exact = Dedup.dedupEmbedCos(spark, sf)
    assert(small.select("id_a", "id_b").except(exact.select("id_a", "id_b")).count() === 0,
      "a 2-table sketch must still never admit a false pair")
  }
}
