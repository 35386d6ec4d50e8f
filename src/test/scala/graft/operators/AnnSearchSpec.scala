package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AnnSearchSpec extends SparkSpec {
  test("ANN candidates prune the corpus yet keep usable top-5 recall") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val queries = vecs.filter(col("vec_id") % 10 === 0)
    val n = vecs.count()

    val ann = AnnSearch.annTopK(vecs, queries, "vec_id", dims = 64, k = 5).cache()

    // exact top-5 ground truth (brute force at this tiny SF)
    val withNorm = vecs.withColumn("nrm",
      sqrt(expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a,v) -> a+v)")))
    val q = withNorm.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"), col("nrm").as("nq"))
    val c = withNorm
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ec"), col("nrm").as("nc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    val exact = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        expr("aggregate(zip_with(eq, ec, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (a,v) -> a+v)")
          / (col("nq") * col("nc")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("query_id", "neighbor_id")

    val nQ = queries.count()
    val hits = exact.join(ann.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / (nQ * 5)
    // random 64-d data is near-orthogonal (hardest case); the point of the
    // spec is the mechanism: meaningful recall with far fewer comparisons
    assert(recall >= 0.4, s"recall@5 was $recall")

    // candidates actually compared:
    val cands = AnnSearch.sketchCells(vecs, "vec_id", 64, 6, 4)
      .groupBy("table_idx", "bucket").count()
      .agg(sum(col("count") * col("count"))).first().getLong(0)
    assert(cands < n * n / 2, s"bucketed comparisons $cands must prune ${n * n}")
  }
}
