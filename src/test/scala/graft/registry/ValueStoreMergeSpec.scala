package graft.registry

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** MERGE + generation-pinned rewrites on the value-store formats:
  * the last lakehouse verb (r11 directive 1) and the snapshot-isolated
  * reads that close the optimize swap race (directive 2). */
class ValueStoreMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-vsm").toString

  private def longRows(feature: String, version: String,
      vals: (String, Double)*): DataFrame =
    vals.toSeq.toDF("entity_id", "value")
      .select(col("entity_id"), col("value"),
        lit(null).cast("string").as("value_str"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
          .as("computed_at"),
        lit(feature).as("feature_name"), lit(version).as("version"))

  private def values(df: DataFrame, feature: String,
      version: String): Map[String, Double] =
    df.filter(col("feature_name") === feature &&
        col("version") === version)
      .select("entity_id", "value").as[(String, Double)].collect().toMap

  test("parquet merge: updates replace matched entities, insert new ones, " +
    "leave other rows and other partitions untouched") {
    val store = new ParquetValueStore(spark, tmp())
    store.append(longRows("f", "v1", "e1" -> 1.0, "e2" -> 2.0, "e3" -> 3.0))
    store.append(longRows("f", "v2", "e1" -> 10.0))
    store.merge(longRows("f", "v1", "e2" -> 22.0, "e9" -> 9.0))
    assert(values(store.read(), "f", "v1") ==
      Map("e1" -> 1.0, "e2" -> 22.0, "e3" -> 3.0, "e9" -> 9.0))
    assert(values(store.read(), "f", "v2") == Map("e1" -> 10.0))
  }

  test("parquet merge into a partition that does not exist is insert-only") {
    val store = new ParquetValueStore(spark, tmp())
    store.append(longRows("f", "v1", "e1" -> 1.0))
    store.merge(longRows("f", "v2", "e5" -> 5.0))
    assert(values(store.read(), "f", "v2") == Map("e5" -> 5.0))
  }

  test("one merge spanning two partitions touches both") {
    val store = new ParquetValueStore(spark, tmp())
    store.append(longRows("f", "v1", "e1" -> 1.0))
    store.append(longRows("g", "v1", "e1" -> 100.0))
    store.merge(longRows("f", "v1", "e1" -> -1.0)
      .unionByName(longRows("g", "v1", "e2" -> 200.0)))
    assert(values(store.read(), "f", "v1") == Map("e1" -> -1.0))
    assert(values(store.read(), "g", "v1") ==
      Map("e1" -> 100.0, "e2" -> 200.0))
  }

  test("rewrites commit as generations: a reader holding the previous " +
    "generation's plan survives one rewrite (keep-two), and readAsOf " +
    "returns the pinned snapshot") {
    val dir = tmp()
    val store = new ParquetValueStore(spark, dir)
    store.append(longRows("f", "v1", "e1" -> 1.0, "e2" -> 2.0))
    assert(store.currentGeneration("f", "v1") == 0L)
    // plan pinned to generation 0 BEFORE the merge commits gen 1
    val held = store.read().filter(col("feature_name") === "f" &&
      col("version") === "v1")
    store.merge(longRows("f", "v1", "e2" -> 22.0))
    assert(store.currentGeneration("f", "v1") == 1L)
    // the held plan still executes against its retained generation and
    // sees the PRE-merge values — snapshot isolation, not a crash
    assert(held.select("entity_id", "value").as[(String, Double)]
      .collect().toMap == Map("e1" -> 1.0, "e2" -> 2.0))
    // fresh reads see the merge; time-travel pins either side
    assert(values(store.read(), "f", "v1") ==
      Map("e1" -> 1.0, "e2" -> 22.0))
    assert(store.readAsOf("f", "v1", 0L)
      .select("entity_id", "value").as[(String, Double)]
      .collect().toMap == Map("e1" -> 1.0, "e2" -> 2.0))
    // a second rewrite GCs generation 0 (keep-two): pinning it now fails
    store.merge(longRows("f", "v1", "e3" -> 3.0))
    assert(store.currentGeneration("f", "v1") == 2L)
    intercept[IllegalArgumentException](store.readAsOf("f", "v1", 0L))
    assert(store.readAsOf("f", "v1", 1L).count() == 2L)
    assert(values(store.read(), "f", "v1") ==
      Map("e1" -> 1.0, "e2" -> 22.0, "e3" -> 3.0))
  }

  test("optimize commits through the same generation protocol: a held " +
    "pre-optimize plan survives the compaction that used to race it") {
    val store = new ParquetValueStore(spark, tmp())
    store.append(longRows("f", "v1",
      (1 to 50).map(i => s"e$i" -> i.toDouble): _*))
    val held = store.read()
    val (nb, na) = store.optimize("f", "v1", targetFiles = 1)
    assert(nb >= na && na == 1)
    assert(held.count() == 50L) // old generation retained, not deleted
    assert(store.read().count() == 50L)
  }

  test("a crashed rewrite's orphan files are invisible and the next " +
    "rewrite commits past them") {
    val dir = tmp()
    val store = new ParquetValueStore(spark, dir)
    store.append(longRows("f", "v1", "e1" -> 1.0))
    // fabricate a crash-before-pointer-swap: gen-1 files exist, pointer
    // still says 0
    val pdir = s"$dir/feature_name=f/version=v1"
    longRows("f", "v1", "eX" -> 99.0).drop("feature_name", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/.orphan")
    val part = new java.io.File(s"$dir/.orphan").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(pdir, s"g1-${part.getName}"))
    // orphan is invisible to reads
    assert(values(store.read(), "f", "v1") == Map("e1" -> 1.0))
    // and the next merge commits ABOVE the orphan generation
    store.merge(longRows("f", "v1", "e2" -> 2.0))
    assert(store.currentGeneration("f", "v1") == 2L)
    assert(values(store.read(), "f", "v1") ==
      Map("e1" -> 1.0, "e2" -> 2.0))
  }

  test("merge verifies the rewrite before committing: row counts are " +
    "target + inserts") {
    val store = new ParquetValueStore(spark, tmp())
    store.append(longRows("f", "v1", "e1" -> 1.0, "e2" -> 2.0))
    store.merge(longRows("f", "v1", "e2" -> 22.0, "e3" -> 3.0, "e4" -> 4.0))
    assert(store.read().filter(col("feature_name") === "f").count() == 4L)
  }

  test("bucketed merge: content correct, partition stays bucketed " +
    "(<= buckets files), serving read intact") {
    val dir = tmp()
    val table = "graft_vsm_bucketed_" + dir.split('/').last.takeRight(8)
    val store = new BucketedParquetValueStore(spark, dir, 4, table)
    store.append(longRows("f", "v1", "e1" -> 1.0, "e2" -> 2.0, "e3" -> 3.0))
    store.merge(longRows("f", "v1", "e2" -> 22.0, "e9" -> 9.0))
    assert(values(store.read(), "f", "v1") ==
      Map("e1" -> 1.0, "e2" -> 22.0, "e3" -> 3.0, "e9" -> 9.0))
    val files = new java.io.File(s"$dir/feature_name=f/version=v1")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length <= 4, s"bucket layout lost: ${files.length} files")
  }

  test("bucketed merge crash recovery: a stage beside a MISSING partition " +
    "is the crashed merge's output and is replayed; beside an intact " +
    "partition it is discarded") {
    val dir = tmp()
    val table = "graft_vsm_crash_" + dir.split('/').last.takeRight(8)
    val store = new BucketedParquetValueStore(spark, dir, 4, table)
    store.append(longRows("f", "v1", "e1" -> 1.0))
    // crash state: stage holds the full merged output, partition dropped
    longRows("f", "v1", "e1" -> 11.0, "e2" -> 2.0)
      .drop("feature_name", "version")
      .write.mode("overwrite").parquet(s"$dir/.merge-f-v1-stage")
    store.dropPartition("f", "v1")
    // the next merge touching the partition replays the stage FIRST,
    // then applies its own updates on top
    store.merge(longRows("f", "v1", "e3" -> 3.0))
    assert(values(store.read(), "f", "v1") ==
      Map("e1" -> 11.0, "e2" -> 2.0, "e3" -> 3.0))
    assert(!new java.io.File(s"$dir/.merge-f-v1-stage").exists())
    // stale stage beside INTACT data: discarded, merge proceeds
    longRows("f", "v1", "eZ" -> 999.0).drop("feature_name", "version")
      .write.mode("overwrite").parquet(s"$dir/.merge-f-v1-stage")
    store.merge(longRows("f", "v1", "e1" -> 111.0))
    val got = values(store.read(), "f", "v1")
    assert(got == Map("e1" -> 111.0, "e2" -> 2.0, "e3" -> 3.0),
      s"stale stage must not leak: $got")
  }

  test("bucketed merge crash recovery, ARMED stage: a partial publish " +
    "that LOOKS intact is re-published from the stage, never trusted") {
    val dir = tmp()
    val table = "graft_vsm_armed_" + dir.split('/').last.takeRight(8)
    val store = new BucketedParquetValueStore(spark, dir, 4, table)
    store.append(longRows("f", "v1", "e1" -> 1.0, "e2" -> 2.0))
    // crash state INSIDE the publish: the partition is visible but
    // PARTIAL (here: the pre-merge content standing in for a torn job
    // commit), and the armed stage holds the verified merged rows
    longRows("f", "v1", "e1" -> 11.0, "e2" -> 2.0, "e3" -> 3.0)
      .drop("feature_name", "version")
      .write.mode("overwrite").parquet(s"$dir/.merge-f-v1-stage")
    new java.io.File(s"$dir/.merge-f-v1-stage/_publish_armed")
      .createNewFile()
    // pre-sentinel rule would discard the stage ("beside intact data")
    // and keep the partial partition; the sentinel forces re-publish
    store.merge(longRows("f", "v1", "e4" -> 4.0))
    assert(values(store.read(), "f", "v1") ==
      Map("e1" -> 11.0, "e2" -> 2.0, "e3" -> 3.0, "e4" -> 4.0))
    assert(!new java.io.File(s"$dir/.merge-f-v1-stage").exists())
  }

  test("FeatureStore.mergeVersion: backfill-correct a served version " +
    "end-to-end; unknown feature/version refuse") {
    val dir = tmp()
    var now = 1000L
    val fs = new FeatureStore(spark, s"$dir/values", () => now)
    fs.registerTable(
      TableDef("orders", Seq("o_custkey", "o_totalprice")),
      graft.Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(fs.computeVersion("total_spend", "v1").isRight)
    val before = fs.featureVectors().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val someEntity = before.keys.head
    now = 2000L
    val r = fs.mergeVersion("total_spend", "v1",
      Seq((someEntity, -42.0), ("synthetic_entity", 7.0))
        .toDF("entity_id", "value"))
    assert(r == Right(2L))
    val after = fs.featureVectors().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after(someEntity) == -42.0)
    assert(after("synthetic_entity") == 7.0)
    assert(after.size == before.size + 1)
    // every other entity unchanged
    assert((after - someEntity - "synthetic_entity") == (before - someEntity))
    assert(fs.mergeVersion("nope", "v1",
      Seq(("e", 1.0)).toDF("entity_id", "value")).isLeft)
    assert(fs.mergeVersion("total_spend", "v9",
      Seq(("e", 1.0)).toDF("entity_id", "value")).isLeft)
    assert(fs.mergeVersion("total_spend", "v1",
      Seq(1.0).toDF("value")).isLeft)
  }
}
