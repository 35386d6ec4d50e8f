package graft.registry

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SchemaValidatorSpec extends SparkSpec {
  private val defn = TableDef("orders", Seq("o_orderkey", "o_totalprice"),
    Map("o_totalprice" -> "numeric", "o_orderstatus" -> "string"))

  test("valid schema passes") {
    val schema = Tables.orders(spark, sf).schema
    assert(SchemaValidator.validate(schema, defn).isRight)
  }

  test("missing required column reported") {
    val schema = StructType(Seq(StructField("o_orderkey", LongType)))
    val Left(errs) = SchemaValidator.validate(schema, defn): @unchecked
    assert(errs.exists(_.contains("o_totalprice")))
  }

  test("type mismatch reported") {
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", StringType)))
    val Left(errs) = SchemaValidator.validate(schema, defn): @unchecked
    assert(errs.exists(e => e.contains("o_totalprice") && e.contains("numeric")))
  }
}

class FeatureStoreSpec extends SparkSpec {
  private def freshStore(tick: () => Long = () => System.currentTimeMillis()) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    new FeatureStore(spark, s"$dir/values", tick)
  }

  private val ordersDef = TableDef("orders", Seq("o_custkey", "o_totalprice"),
    Map("o_totalprice" -> "numeric"))

  test("register + duplicate rejection") {
    val fs = freshStore()
    val orders = Tables.orders(spark, sf)
    assert(fs.registerTable(ordersDef, orders).isRight)
    assert(fs.registerTable(ordersDef, orders).isLeft)
    assert(fs.listTables.map(_.name) == Seq("orders"))
  }

  test("schema validation rejects bad registration") {
    val fs = freshStore()
    val bad = TableDef("orders", Seq("missing_col"))
    assert(fs.registerTable(bad, Tables.orders(spark, sf)).isLeft)
  }

  test("compute version, latest resolution and vector serving") {
    var now = 1000L
    val fs = freshStore(() => now)
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs.defineFeature(FeatureDef("order_cnt", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(count(lit(1)).cast("double").as("value"))))

    assert(fs.computeVersion("total_spend", "v1").isRight)
    now = 2000L
    assert(fs.computeVersion("order_cnt", "v1").isRight)
    // duplicate version rejected (reference main.py:137)
    assert(fs.computeVersion("total_spend", "v1").isLeft)

    // recompute a second version later; latest must pick it
    now = 3000L
    assert(fs.computeVersion("total_spend", "v2").isRight)

    val latest = fs.latestValues()
    val perFeature = latest.groupBy("feature_name").agg(max("version").as("v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(perFeature("total_spend") == "v2")
    assert(perFeature("order_cnt") == "v1")

    val vecs = fs.featureVectors()
    assert(vecs.columns.toSet == Set("entity_id", "total_spend", "order_cnt"))
    assert(vecs.count() > 0)

    // pinned version serves only that version's features
    val pinned = fs.featureVectors(version = Some("v2"))
    assert(pinned.columns.toSet == Set("entity_id", "total_spend"))
  }

  test("deprecated versions are excluded from latest") {
    var now = 1000L
    val fs = freshStore(() => now)
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs.computeVersion("total_spend", "v1")
    now = 2000L
    fs.computeVersion("total_spend", "v2")
    fs.deprecate("total_spend", "v2")
    val versionsUsed = fs.latestValues().select("version").distinct()
      .collect().map(_.getString(0)).toSet
    assert(versionsUsed == Set("v1"))
  }

  test("serving cache: hit within TTL, recompute after invalidation") {
    var now = 1000L
    val fs = freshStore(() => now)
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs.computeVersion("total_spend", "v1")

    val someEntity = fs.latestValues().select("entity_id").first().getString(0)
    val v1 = fs.getVector(someEntity)
    assert(v1.contains("total_spend"))
    assert(fs.cacheMisses == 1)
    val v2 = fs.getVector(someEntity)
    assert(v2 == v1 && fs.cacheHits == 1)
    // TTL expiry forces recompute
    now += 3600 * 1000L + 1
    fs.getVector(someEntity)
    assert(fs.cacheMisses == 2)
  }
}
