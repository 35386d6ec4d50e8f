package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class NgramDedupSpec extends SparkSpec {
  private def shingled = Tables.documents(spark, sf)
    .select(col("doc_id"), split(col("text"), " ").as("toks"))
    .filter(size(col("toks")) >= 3)
    .select(col("doc_id"), explode(array_distinct(expr(
      "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))

  test("df-capped candidate generation finds the same >=0.5 pairs as exact") {
    val sh = shingled.cache()
    val scalable = NgramDedup.scalablePairs(sh, "doc_id", 0.5, maxDf = 50)
      .select("id_a", "id_b")
    val exact = Dedup.dedupNgramJaccard(spark, sf).select("id_a", "id_b")
    assert(exact.except(scalable).count() === 0, "df-capping lost a true pair")
    assert(scalable.except(exact).count() === 0, "verification admitted a false pair")
  }

  test("df cap prunes the heavy blocking keys") {
    val sh = shingled.cache()
    val total = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val heavyCost = total.agg(sum(col("df") * col("df"))).first().getLong(0)
    // at this tiny SF only the hottest shingles exceed a low cap
    val cappedCost = total.filter(col("df") <= 5)
      .agg(sum(col("df") * col("df"))).first().getLong(0)
    assert(cappedCost < heavyCost, "cap must reduce join cost")
  }
}
