package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  private def tmp() = java.nio.file.Files.createTempDirectory("graft-src").toString

  test("json-lines round trip preserves rows with pinned schema") {
    val docs = Tables.documents(spark, sf)
    val dir = s"${tmp()}/docs_json"
    Sources.writeJsonLines(docs, dir)
    val back = Sources.jsonLines(spark, dir, docs.schema)
    assert(back.count() === docs.count())
    assert(back.select(sum(length(col("text")))).first().getLong(0) ===
      docs.select(sum(length(col("text")))).first().getLong(0))
  }

  test("csv round trip preserves scalar columns") {
    val cust = Tables.customer(spark, sf)
    val dir = s"${tmp()}/cust_csv"
    Sources.writeCsv(cust, dir)
    val back = Sources.csv(spark, dir, cust.schema)
    assert(back.count() === cust.count())
    assert(back.except(cust).count() === 0)
  }

  test("partitioned parquet sink prunes partitions on read") {
    val ev = Tables.events(spark, sf)
    val dir = s"${tmp()}/ev_part"
    Sources.writePartitioned(ev, dir, Seq("event_type"))
    val one = spark.read.parquet(dir).filter(col("event_type") === "click")
    assert(one.count() === ev.filter(col("event_type") === "click").count())
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || one.count() > 0)
  }

  test("orc round trip is exact; filters push to the ORC scan; partitions prune") {
    val cust = Tables.customer(spark, sf)
    val dir = s"${tmp()}/cust_orc"
    Sources.writeOrc(cust, dir)
    val back = Sources.orc(spark, dir, cust.schema)
    assert(back.except(cust).count() === 0 && cust.except(back).count() === 0)
    // predicate pushdown reaches the ORC scan exactly as on parquet
    val filtered = back.filter(col("c_custkey") === 42L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_custkey"), plan)
    assert(filtered.count() === 1)
    // partitioned ORC sink prunes like the parquet layout
    val ev = Tables.events(spark, sf)
    val pdir = s"${tmp()}/ev_orc"
    Sources.writeOrcPartitioned(ev, pdir, Seq("event_type"))
    val one = spark.read.orc(pdir).filter(col("event_type") === "click")
    assert(one.count() === ev.filter(col("event_type") === "click").count())
    assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("vec_dot is callable from SQL after registration") {
    org.apache.spark.sql.graft.VecFunctions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val r = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS n2 FROM emb LIMIT 5").collect()
    assert(r.length === 5)
    r.foreach(row => assert(row.getDouble(1) >= 0.0))
  }
}
