package graft.registry

import graft.{SparkSpec, Tables}
import graft.streaming.StreamingMaterializer
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The three feature-store guarantees beyond CRUD: time-travel
  * reproducibility, online/offline parity, and pre-materialization data
  * quality. */
class GuaranteesSpec extends SparkSpec {

  test("time-travel: as-of resolution ignores later versions") {
    var now = 1000L
    val dir = java.nio.file.Files.createTempDirectory("graft-tt").toString
    val fs = new FeatureStore(spark, s"$dir/values", () => now)
    fs.registerTable(TableDef("orders", Seq("o_custkey", "o_totalprice"),
      Map("o_totalprice" -> "numeric")), Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs.computeVersion("total_spend", "v1")
    now = 5000L
    fs.computeVersion("total_spend", "v2")

    val asOf2k = fs.latestValuesAsOf(2000L).select("version").distinct()
      .collect().map(_.getString(0)).toSet
    val asOfNow = fs.latestValuesAsOf(now).select("version").distinct()
      .collect().map(_.getString(0)).toSet
    assert(asOf2k === Set("v1"))
    assert(asOfNow === Set("v2"))
  }

  test("backfill computes a version over a slice only") {
    var now = 1000L
    val dir = java.nio.file.Files.createTempDirectory("graft-bf").toString
    val fs = new FeatureStore(spark, s"$dir/values", () => now)
    fs.registerTable(TableDef("orders", Seq("o_custkey", "o_totalprice"),
      Map("o_totalprice" -> "numeric")), Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("order_cnt", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(count(lit(1)).cast("double").as("value"))))
    assert(fs.backfill("order_cnt", "v_1996",
      df => df.filter(year(col("o_orderdate")) === 1996)).isRight)
    val total = fs.latestValues().agg(sum("value")).collect()(0).getDouble(0)
    val expect = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1996).count().toDouble
    assert(total === expect)
    // the sliced compute must not leak into later versions
    now = 2000L
    fs.computeVersion("order_cnt", "v_all")
    val totalAll = fs.latestValues().agg(sum("value")).collect()(0).getDouble(0)
    assert(totalAll === Tables.orders(spark, sf).count().toDouble)
  }

  test("online/offline parity: streaming windows equal the batch plan") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val raw = Tables.events(spark, sf)
      .select(col("ts"), col("user_id"), col("value"))
      .limit(200).collect()
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val streamDf = mem.toDF().toDF("ts", "user_id", "value")
    val q = StreamingMaterializer.writer(
      StreamingMaterializer.windowedFeatures(streamDf, "1 hour", "2 hours"),
      "parity_stream").format("memory").start()
    try {
      mem.addData(raw.map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSeq)
      q.processAllAvailable()
      // two sentinel batches: the watermark computed from batch N's max
      // event time only evicts state during batch N+1
      mem.addData((Timestamp.valueOf("2030-01-01 00:00:00"), -1L, 0.0))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2031-01-01 00:00:00"), -1L, 0.0))
      q.processAllAvailable()
      val online = spark.table("parity_stream")
        .filter(col("entity_id") =!= "-1")
        .select("entity_id", "window_start", "n_events")
      val batch = spark.createDataFrame(
          spark.sparkContext.parallelize(raw.toIndexedSeq), Tables.events(spark, sf)
            .select(col("ts"), col("user_id"), col("value")).schema)
        .groupBy(window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id").cast("string").as("entity_id"),
          col("window.start").as("window_start"), col("n_events"))
      assert(batch.except(online).count() === 0)
      assert(online.except(batch).count() === 0)
    } finally q.stop()
  }

  test("expectations: one-pass rule evaluation finds violations") {
    val docs = Tables.documents(spark, sf)
    val report = Expectations.check(docs, Seq(
      Expectations.NotNull("text"),
      Expectations.InRange("n_chars", 0, 10000),
      Expectations.OneOf("lang", Seq("en", "es", "fr", "de", "zh")),
      Expectations.InRange("n_chars", 0, 100)))   // deliberately tight
    assert(report.rows === docs.count())
    assert(report.violations("not_null(text)") === 0)
    assert(report.violations("one_of(lang)") === 0)
    assert(report.violations("in_range(n_chars,[0.0,100.0])") > 0)
    assert(!report.passed)
    assert(Expectations.checkUnique(docs, Seq("doc_id")) === 0)
  }

  test("quarantine routes failing rows with named violations, loses nothing") {
    val docs = Tables.documents(spark, sf)
    val rules = Seq(
      Expectations.InRange("n_chars", 0, 100),  // deliberately tight
      Expectations.OneOf("lang", Seq("en", "es")))  // excludes fr/de/zh
    val (clean, dirty) = Expectations.quarantine(docs, rules)
    assert(clean.count() + dirty.count() === docs.count())
    // clean side really satisfies every rule and carries no tag column
    assert(!clean.columns.contains("_violations"))
    assert(clean.filter(col("n_chars") > 100).count() === 0)
    assert(clean.filter(!col("lang").isin("en", "es")).count() === 0)
    // quarantined rows name exactly the rules they break
    val both = dirty.filter(col("n_chars") > 100 && !col("lang").isin("en", "es"))
    assert(both.filter(size(col("_violations")) =!= 2).count() === 0)
    val langOnly = dirty.filter(col("n_chars") <= 100 && !col("lang").isin("en", "es"))
    assert(langOnly.filter(!array_contains(col("_violations"), "one_of(lang)")).count() === 0)
    // and the counting pass agrees with the routing pass
    val report = Expectations.check(docs, rules)
    assert(report.violations.values.max <= dirty.count())
  }
}
