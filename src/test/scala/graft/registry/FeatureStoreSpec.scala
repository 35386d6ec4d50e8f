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

  test("list endpoints paginate with skip/limit") {
    val fs = freshStore()
    val orders = Tables.orders(spark, sf)
    Seq("t_a", "t_b", "t_c", "t_d").foreach { n =>
      fs.registerTable(TableDef(n, Seq("o_custkey")), orders)
      fs.defineFeature(FeatureDef(s"f_$n", n, "numeric",
        df => df.groupBy(col("o_custkey").as("entity_id"))
          .agg(count(lit(1)).cast("double").as("value"))))
    }
    assert(fs.listTables(1, 2).map(_.name) == Seq("t_b", "t_c"))
    assert(fs.listTables(3, 10).map(_.name) == Seq("t_d"))
    assert(fs.listTables(0, Int.MaxValue).size == 4) // saturating end
    assert(fs.listFeatures(2, 1).map(_.name) == Seq("f_t_c"))
    fs.computeVersion("f_t_a", "v1")
    fs.computeVersion("f_t_a", "v2")
    assert(fs.listVersions("f_t_a", 1, 5).map(_.version) == Seq("v2"))
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

  test("categorical feature materializes into value_str and serves end-to-end") {
    var now = 1000L
    val fs = freshStore(() => now)
    fs.registerTable(TableDef("orders", Seq("o_custkey", "o_orderstatus", "o_totalprice"),
      Map("o_orderstatus" -> "string")), Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("last_status", "orders", "categorical",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(max(col("o_orderstatus")).as("value"))))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(fs.computeVersion("last_status", "v1").isRight)
    now = 2000L
    assert(fs.computeVersion("total_spend", "v1").isRight)

    // long-format store: categorical rows carry value_str, numeric carry value
    val stored = fs.latestValues(Some(Seq("last_status")))
    assert(stored.filter(col("value_str").isNull).count() == 0)
    assert(stored.filter(col("value").isNotNull).count() == 0)

    // wide vector: string column next to double column
    val vecs = fs.featureVectors()
    assert(vecs.schema("last_status").dataType == org.apache.spark.sql.types.StringType)
    assert(vecs.schema("total_spend").dataType == org.apache.spark.sql.types.DoubleType)
    val entity = vecs.select("entity_id").first().getString(0)
    val served = fs.getVector(entity)
    assert(served("last_status").isInstanceOf[String])
    assert(Set("O", "F", "P").contains(served("last_status").asInstanceOf[String]))
  }

  test("SQL-defined feature: registered as data, validated at the door, vectors identical to the closure twin") {
    var now = 1000L
    val fs = freshStore(() => now)
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    // the closure twin and the SQL-as-data twin of the same feature
    fs.defineFeature(FeatureDef("spend_closure", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    val sqlDef = FeatureDef.sql("spend_sql", "orders", "numeric",
      "SELECT o_custkey AS entity_id, sum(o_totalprice) AS value " +
        "FROM __THIS__ GROUP BY 1")
    assert(fs.defineFeature(sqlDef).isRight)
    // the registry exposes the computation as data (the reference's
    // computation_logic column, models.py:25-42)
    assert(fs.listFeatures.find(_.name == "spend_sql").flatMap(_.logic)
      .exists(_.contains("sum(o_totalprice)")))

    // rejected AT REGISTRATION, nothing stored: parse error, unknown
    // column, wrong output shape
    val Left(parseErr) = fs.defineFeature(FeatureDef.sql("bad_parse",
      "orders", "numeric", "SELEKT nope FROM __THIS__")): @unchecked
    assert(parseErr.exists(_.contains("failed analysis")))
    val Left(colErr) = fs.defineFeature(FeatureDef.sql("bad_col",
      "orders", "numeric",
      "SELECT no_such_col AS entity_id, 1.0 AS value FROM __THIS__")): @unchecked
    assert(colErr.exists(_.contains("failed analysis")))
    val Left(shapeErr) = fs.defineFeature(FeatureDef.sql("bad_shape",
      "orders", "numeric",
      "SELECT o_custkey AS entity_id, 1.0 AS value, 2.0 AS extra " +
        "FROM __THIS__")): @unchecked
    assert(shapeErr.exists(_.contains("(entity_id, value)")))
    assert(fs.listFeatures.map(_.name).toSet ===
      Set("spend_closure", "spend_sql"))

    // end to end: compute + serve, vectors identical to the closure twin
    assert(fs.computeVersion("spend_closure", "v1").isRight)
    assert(fs.computeVersion("spend_sql", "v1").isRight)
    val vecs = fs.featureVectors()
    assert(vecs.filter(col("spend_closure") =!= col("spend_sql") ||
      col("spend_closure").isNull =!= col("spend_sql").isNull).count() === 0L)
    val entity = vecs.select("entity_id").first().getString(0)
    val served = fs.getVector(entity)
    assert(served("spend_sql") === served("spend_closure"))
  }

  test("optimizeVersion compacts a fragmented partition; vectors identical; bucketed partitions are born compact") {
    var now = 1000L
    val dir = java.nio.file.Files.createTempDirectory("graft-opt").toString
    val fs = new FeatureStore(spark, s"$dir/values", () => now)
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    // the explicit repartition(5) models a cluster-scale aggregate whose
    // output tasks each write a file (AQE coalesces the tiny local one)
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value")).repartition(5)))
    assert(fs.computeVersion("total_spend", "v1").isRight)
    val before = fs.featureVectors().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

    val Right((nb, na)) = fs.optimizeVersion("total_spend", "v1"): @unchecked
    assert(nb > 1, s"expected a fragmented partition, saw $nb file(s)")
    assert(na === 1, s"expected 1 file after compaction, saw $na")
    val after = fs.featureVectors().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after === before, "compaction must not change served vectors")
    // idempotent: already compact reports itself and rewrites nothing
    assert(fs.optimizeVersion("total_spend", "v1") === Right((1, 1)))
    assert(fs.optimizeVersion("nope", "v1").isLeft)

    // bucketed store: the optimized write (repartition on the bucket
    // column) lands each partition as <= buckets files, so optimize is
    // a verifying no-op
    val bdir = java.nio.file.Files.createTempDirectory("graft-optb").toString
    val bfs = new FeatureStore(spark, s"$bdir/values", () => now,
      bucketEntities = Some(4))
    bfs.registerTable(ordersDef, Tables.orders(spark, sf))
    bfs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(bfs.computeVersion("total_spend", "v1").isRight)
    val Right((bb, ba)) = bfs.optimizeVersion("total_spend", "v1"): @unchecked
    assert(bb <= 4 && bb === ba,
      s"bucketed partition must be born compact (<= 4 files), saw ($bb, $ba)")
    assert(bfs.featureVectors().collect().map(r =>
      r.getString(0) -> r.getDouble(1)).toMap === before)
  }

  test("the value-store format is one injectable seam: a custom format carries every physical operation") {
    var now = 1000L
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val inner = new ParquetValueStore(spark, s"$dir/values")
    val counted = new ValueStoreFormat {
      def append(rows: org.apache.spark.sql.DataFrame): Unit = {
        calls += "append"; inner.append(rows) }
      def read(): org.apache.spark.sql.DataFrame = {
        calls += "read"; inner.read() }
      def dropPartition(f: String, v: String): Unit = {
        calls += s"drop:$f/$v"; inner.dropPartition(f, v) }
      def optimize(f: String, v: String, t: Int): (Int, Int) = {
        calls += s"optimize:$f/$v"; inner.optimize(f, v, t) }
      def merge(updates: org.apache.spark.sql.DataFrame): Unit = {
        calls += "merge"; inner.merge(updates) }
    }
    val fs = new FeatureStore(spark, s"$dir/values", () => now,
      valueFormat = Some(counted))
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(fs.computeVersion("total_spend", "v1").isRight)
    assert(fs.featureVectors().count() > 0)
    assert(fs.optimizeVersion("total_spend", "v1").isRight)
    import spark.implicits._
    assert(fs.mergeVersion("total_spend", "v1",
      Seq(("42", 1.0)).toDF("entity_id", "value")).isRight)
    fs.archive("total_spend", "v1")
    assert(fs.purgeArchived() === Seq(("total_spend", "v1")))
    assert(calls.contains("append") && calls.contains("read") &&
      calls.contains("optimize:total_spend/v1") &&
      calls.contains("merge") &&
      calls.contains("drop:total_spend/v1"),
      s"every physical operation must route through the seam, saw $calls")
  }

  test("version metadata survives a restart: fresh instance serves same vectors") {
    var now = 1000L
    val dir = java.nio.file.Files.createTempDirectory("graft-persist").toString
    val path = s"$dir/values"
    val fs1 = new FeatureStore(spark, path, () => now)
    fs1.registerTable(ordersDef, Tables.orders(spark, sf))
    fs1.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs1.computeVersion("total_spend", "v1", Map("job" -> "nightly"))
    now = 2000L
    fs1.computeVersion("total_spend", "v2")
    fs1.deprecate("total_spend", "v2")
    val before = fs1.featureVectors().collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // a brand-new instance over the same path, no re-registration
    val fs2 = new FeatureStore(spark, path, () => now)
    assert(fs2.listVersions("total_spend").map(v => v.version -> v.status).toMap
      == Map("v1" -> "active", "v2" -> "deprecated"))
    assert(fs2.listVersions("total_spend").find(_.version == "v1").get.metadata("job") == "nightly")
    val after = fs2.featureVectors().collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after == before)
  }

  test("archive excludes from serving; purge deletes partitions and survives restart") {
    var now = 1000L
    val dir = java.nio.file.Files.createTempDirectory("graft-purge").toString
    val path = s"$dir/values"
    val fs = new FeatureStore(spark, path, () => now)
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs.computeVersion("total_spend", "v1")
    now = 2000L
    fs.computeVersion("total_spend", "v2")

    fs.archive("total_spend", "v1")
    assert(fs.latestValues().select("version").distinct()
      .collect().map(_.getString(0)).toSet == Set("v2"))

    assert(fs.purgeArchived() == Seq(("total_spend", "v1")))
    assert(!new java.io.File(s"$path/feature_name=total_spend/version=v1").exists())
    assert(new java.io.File(s"$path/feature_name=total_spend/version=v2").exists())
    assert(fs.listVersions("total_spend").map(_.version) == Seq("v2"))

    // restart: the tombstone keeps the purged version gone
    val fs2 = new FeatureStore(spark, path, () => now)
    assert(fs2.listVersions("total_spend").map(_.version) == Seq("v2"))
    assert(fs2.featureVectors().count() > 0)
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

  test("bucketed store: serving plans with no shuffle exchange, same values, survives restart") {
    var now = 1000L
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    def define(fs: FeatureStore): Unit = {
      fs.registerTable(ordersDef, Tables.orders(spark, sf))
      fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
        df => df.groupBy(col("o_custkey").as("entity_id"))
          .agg(sum("o_totalprice").as("value"))))
      fs.defineFeature(FeatureDef("order_cnt", "orders", "numeric",
        df => df.groupBy(col("o_custkey").as("entity_id"))
          .agg(count(lit(1)).cast("double").as("value"))))
    }
    val fsB = new FeatureStore(spark, s"$dir/values", () => now, bucketEntities = Some(8))
    define(fsB)
    fsB.computeVersion("total_spend", "v1")
    now = 2000L
    fsB.computeVersion("order_cnt", "v1")

    // the whole serving path (scan -> active filter -> latest window ->
    // vector aggregate) is keyed by entity_id, which the bucketed scan
    // already clusters: no shuffle exchange anywhere in the plan
    val vecs = fsB.featureVectors()
    val plan = vecs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed serving must not shuffle:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected bucketed scan:\n$plan")

    // identical values to an unbucketed store over the same features
    val dirP = java.nio.file.Files.createTempDirectory("graft-plain").toString
    val fsP = new FeatureStore(spark, s"$dirP/values", () => now)
    define(fsP)
    fsP.computeVersion("total_spend", "v1")
    fsP.computeVersion("order_cnt", "v1")
    def snap(fs: FeatureStore) = fs.featureVectors().collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(snap(fsB) === snap(fsP))

    // restart: catalog entry gone (fresh session semantics), files remain
    spark.sql(s"DROP TABLE ${fsB.bucketTable}")
    val fsB2 = new FeatureStore(spark, s"$dir/values", () => now, bucketEntities = Some(8))
    assert(snap(fsB2) === snap(fsP))
  }

  test("serving cache is LRU-bounded: maxsize evicts least-recently-used") {
    var now = 1000L
    val fs = freshStore(() => now)
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs.computeVersion("total_spend", "v1")
    val ids = fs.latestValues().select("entity_id").orderBy("entity_id").limit(5)
      .collect().map(_.getString(0)).toSeq
    fs.setCacheMaxSize(3)
    ids.take(4).foreach(fs.getVector(_))        // e0..e3 -> e0 evicted
    assert(fs.cacheSize == 3 && fs.cacheMisses == 4)
    fs.getVector(ids(1))                        // touch e1 (hit) -> LRU is e2
    assert(fs.cacheHits == 1)
    fs.getVector(ids(4))                        // insert e4 -> evicts e2
    assert(fs.cacheSize == 3)
    fs.getVector(ids(1))                        // e1 still resident
    assert(fs.cacheHits == 2)
    val missesBefore = fs.cacheMisses
    fs.getVector(ids(2))                        // e2 was evicted -> miss
    assert(fs.cacheMisses == missesBefore + 1)
    // shrinking trims immediately
    fs.setCacheMaxSize(1)
    assert(fs.cacheSize == 1)
  }

  test("archive/deprecate invalidate the serving cache immediately") {
    var now = 1000L
    val fs = freshStore(() => now)
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs.computeVersion("total_spend", "v1")
    now = 2000L
    fs.computeVersion("total_spend", "v2")
    val entity = fs.latestValues().select("entity_id").first().getString(0)
    fs.getVector(entity)                         // cached from v2
    fs.archive("total_spend", "v2")              // must not serve stale v2
    val misses = fs.cacheMisses
    fs.getVector(entity)
    assert(fs.cacheMisses == misses + 1, "archived version served from stale cache")
  }

  test("feature names and version tags are identifier-validated") {
    val fs = freshStore()
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    val bad = FeatureDef("evil'; DROP TABLE x--", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value")))
    assert(fs.defineFeature(bad).isLeft)
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(fs.computeVersion("total_spend", "v1/../../etc").isLeft)
    assert(fs.computeVersion("total_spend", "v1.0").isRight)
  }

  test("concurrent computeVersion on one (feature, version): exactly one writer wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mw").toString
    val path = s"$dir/values"
    def mkStore() = {
      val fs = new FeatureStore(spark, path)
      fs.registerTable(ordersDef, Tables.orders(spark, sf))
      fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
        df => df.groupBy(col("o_custkey").as("entity_id"))
          .agg(sum("o_totalprice").as("value"))))
      fs
    }
    val (fs1, fs2) = (mkStore(), mkStore())
    // two store instances (separate in-memory state, same path) racing
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val results = Await.result(Future.sequence(Seq(
      Future(fs1.computeVersion("total_spend", "v1")),
      Future(fs2.computeVersion("total_spend", "v1")))), 120.seconds)
    assert(results.count(_.isRight) == 1, s"expected exactly one winner: $results")
    assert(results.count(_.isLeft) == 1)
    // a third, late writer is rejected via manifest refresh, not just the lock
    val fs3 = mkStore()
    assert(fs3.computeVersion("total_spend", "v1").isLeft)
    // the winning version is intact and serves
    val fresh = new FeatureStore(spark, path)
    assert(fresh.listVersions("total_spend").map(_.version) == Seq("v1"))
    assert(fresh.featureVectors().count() > 0)
  }

  test("prefetchVectors warms the cache in one job") {
    var now = 1000L
    val fs = freshStore(() => now)
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs.computeVersion("total_spend", "v1")
    val ids = fs.latestValues().select("entity_id").limit(5)
      .collect().map(_.getString(0)).toSeq
    assert(fs.prefetchVectors(ids) == ids.size)
    ids.foreach(id => assert(fs.getVector(id).contains("total_spend")))
    assert(fs.cacheHits == ids.size && fs.cacheMisses == 0)
  }

  test("publishOnlineView: one file per bucket, hash routing matches the " +
    "driver-side bucketOf, point reads equal the serving path") {
    val fs = freshStore()
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs.defineFeature(FeatureDef("order_cnt", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(count(lit(1)).cast("double").as("value"))))
    assert(fs.computeVersion("total_spend", "v1").isRight)
    assert(fs.computeVersion("order_cnt", "v1").isRight)

    val out = java.nio.file.Files.createTempDirectory("graft-online").toString
    val buckets = 8
    val n = fs.publishOnlineView(s"$out/view", buckets)
    assert(n === fs.featureVectors().count())

    // READ-AMPLIFICATION PIN: every bucket directory holds EXACTLY ONE
    // parquet file — a point lookup touches one file, full stop
    val dirs = new java.io.File(s"$out/view").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(dirs.nonEmpty && dirs.length <= buckets)
    dirs.foreach { d =>
      val files = d.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1,
        s"${d.getName} holds ${files.length} files — read amp broken")
    }

    // routing: every row in bucket=N hashes to N under bucketOf
    for (d <- dirs) {
      val b = d.getName.stripPrefix("bucket=").toInt
      val ids = spark.read.parquet(d.toString)
        .select("entity_id").collect().map(_.getString(0))
      assert(ids.nonEmpty)
      ids.foreach(id => assert(FeatureStore.bucketOf(id, buckets) === b,
        s"entity $id landed in bucket $b but hashes to " +
          s"${FeatureStore.bucketOf(id, buckets)}"))
    }

    // point reads equal the store serving path, absent entity -> empty
    val sample = fs.featureVectors().select("entity_id")
      .limit(5).collect().map(_.getString(0))
    sample.foreach { id =>
      assert(FeatureStore.readOnlineVector(spark, s"$out/view", id)
        === fs.getVector(id))
    }
    assert(FeatureStore.readOnlineVector(spark, s"$out/view",
      "no_such_entity") === Map.empty)
  }

  test("publishOnlineGeneration: pointer swap is all-or-nothing, prune keeps the target") {
    val fs = freshStore()
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs.defineFeature(FeatureDef("order_cnt", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(count(lit(1)).cast("double").as("value"))))
    assert(fs.computeVersion("total_spend", "v1").isRight)
    assert(fs.computeVersion("order_cnt", "v1").isRight)

    val base = java.nio.file.Files.createTempDirectory("graft-gens").toString
    // no pointer before the first completed publish -> loud refusal
    intercept[IllegalArgumentException] {
      FeatureStore.resolveOnlineLatest(spark, base)
    }
    val g0 = fs.publishOnlineGeneration(base, buckets = 4,
      featureNames = Some(Seq("total_spend")))
    assert(g0.endsWith("gen=0"))
    val id = fs.featureVectors().select("entity_id")
      .limit(1).collect().head.getString(0)
    val v0 = FeatureStore.readOnlineVectorLatest(spark, base, id)
    assert(v0.keySet === Set("total_spend"))

    // second generation with a different vector shape; the pointer must
    // move and readers must see the NEW shape — the old dir stays for
    // in-flight readers until pruned
    val g1 = fs.publishOnlineGeneration(base, buckets = 4)
    assert(g1.endsWith("gen=1"))
    val v1 = FeatureStore.readOnlineVectorLatest(spark, base, id)
    assert(v1.keySet === Set("total_spend", "order_cnt"))
    assert(new java.io.File(g0).exists, "old generation reclaimed too early")

    val g2 = fs.publishOnlineGeneration(base, buckets = 4)
    val deleted = FeatureStore.pruneOnlineGenerations(spark, base, keep = 1)
    assert(deleted === Seq("gen=0", "gen=1"))
    assert(!new java.io.File(g0).exists && new java.io.File(g2).exists)
    // the pointer target always survives pruning
    assert(FeatureStore.resolveOnlineLatest(spark, base) === g2)
    assert(FeatureStore.readOnlineVectorLatest(spark, base, id) === v1)
    // the swap leaves no temp debris beside the pointer
    val leftovers = new java.io.File(base).listFiles
      .filter(_.getName.startsWith("._latest_tmp"))
    assert(leftovers.isEmpty, s"temp pointer files leaked: ${leftovers.toSeq}")
  }

  test("publishOnlineGeneration: writer lock refuses a concurrent publish; stray gen dirs are inert") {
    val fs = freshStore()
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(fs.computeVersion("total_spend", "v1").isRight)
    val base = java.nio.file.Files.createTempDirectory("graft-genlock").toString
    fs.publishOnlineGeneration(base, buckets = 4)

    // a holder of _lock_publish means a publish is in flight: the second
    // publisher must fail loudly BEFORE writing anything (two publishers
    // computing max+1 would overwrite the same gen dir)
    val lock = new java.io.File(base, "_lock_publish")
    assert(lock.createNewFile())
    val before = new java.io.File(base).listFiles.map(_.getName).toSet
    val ex = intercept[IllegalStateException] {
      fs.publishOnlineGeneration(base, buckets = 4)
    }
    assert(ex.getMessage.contains("online-generation publish"))
    assert(new java.io.File(base).listFiles.map(_.getName).toSet === before,
      "losing publisher wrote data")
    assert(lock.delete())

    // a stray non-numeric gen=* entry (manual copy, editor dropping) must
    // neither brick the next publish nor be deleted by prune
    assert(new java.io.File(base, "gen=backup_manual").mkdir())
    val g1 = fs.publishOnlineGeneration(base, buckets = 4)
    assert(g1.endsWith("gen=1"))
    fs.publishOnlineGeneration(base, buckets = 4)
    val deleted = FeatureStore.pruneOnlineGenerations(spark, base, keep = 1)
    assert(deleted === Seq("gen=0", "gen=1"))
    assert(new java.io.File(base, "gen=backup_manual").exists,
      "prune deleted a directory it did not publish")
    assert(!new java.io.File(base, "_lock_publish").exists,
      "publish leaked its writer lock")
  }

  test("online view: empty buckets read as absent, 'bucket' feature name refuses", graft.Slow) {
    val fs = freshStore()
    fs.registerTable(ordersDef, Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(fs.computeVersion("total_spend", "v1").isRight)
    val out = java.nio.file.Files.createTempDirectory("graft-sparse").toString
    // buckets >> entities guarantees EMPTY buckets; a lookup hashing
    // into one must return absent, never PATH_NOT_FOUND (partitionBy
    // creates directories only for non-empty buckets)
    val buckets = 4096
    fs.publishOnlineView(s"$out/view", buckets)
    val present = new java.io.File(s"$out/view").listFiles
      .count(_.getName.startsWith("bucket="))
    assert(present < buckets, "need at least one empty bucket for this test")
    val probes = (0 until 500).map(i => s"ghost_$i")
    val emptyBucketProbe = probes.find { p =>
      !new java.io.File(
        s"$out/view/bucket=${FeatureStore.bucketOf(p, buckets)}").exists
    }
    assert(emptyBucketProbe.isDefined)
    assert(FeatureStore.readOnlineVector(spark, s"$out/view",
      emptyBucketProbe.get) === Map.empty)

    // a feature named 'bucket' would be overwritten by the routing
    // column and stripped by partitionBy — must refuse at the door
    fs.defineFeature(FeatureDef("bucket", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(count(lit(1)).cast("double").as("value"))))
    assert(fs.computeVersion("bucket", "v1").isRight)
    val e = intercept[IllegalArgumentException] {
      fs.publishOnlineView(s"$out/view2", 8)
    }
    assert(e.getMessage.contains("bucket"))
  }
}
