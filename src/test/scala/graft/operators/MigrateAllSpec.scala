package graft.operators

import graft.{SparkSpec, Tables}
import graft.registry.{FeatureDef, FeatureStore, Incremental, TableDef}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** r18 directive 5 — the whole-store knob flip: `migrateAll(root)`
  * discovers every pointer site by name and applies the G49 per-pointer
  * migration, so flipping `spark.graft.commit.mode` over a populated
  * deployment is one verb instead of ≥11 hand-enumerated site classes.
  * The fixture builds a store with EVERY site class present; the sweep
  * must flip them all, survive a mid-sweep crash (re-run completes,
  * readers resolve the old value throughout), and come back. */
class MigrateAllSpec extends SparkSpec {
  import spark.implicits._

  private def buildPopulatedRoot(): (String, Seq[String]) = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-migrate-all").toString

    // values store: versions (manifest log, NOT a pointer), a merge
    // (creates the per-partition `_gen` pointer), the definition
    // catalog (`_catalog`), and an online generation tree (`_latest`
    // + per-generation `_online_meta.json`)
    val store = new FeatureStore(spark, s"$root/values")
    assert(store.registerTable(
      TableDef("orders", Seq("o_custkey", "o_totalprice"),
        Map("o_totalprice" -> "numeric")), Tables.orders(spark, sf)).isRight)
    assert(store.defineFeature(FeatureDef.sql("total_spend", "orders",
      "numeric",
      """SELECT o_custkey AS entity_id,
        | CAST(SUM(floor(o_totalprice * 100 + 0.5)) AS DOUBLE)/100 AS value
        |FROM __THIS__ GROUP BY o_custkey""".stripMargin)).isRight)
    assert(store.computeVersion("total_spend", "v1").isRight)
    val anyEntity = store.featureVectors().select("entity_id")
      .limit(1).collect().head.getString(0)
    assert(store.mergeVersion("total_spend", "v1",
      Seq((anyEntity, 42.0)).toDF("entity_id", "value")).isRight)
    store.saveDefs()
    store.publishOnlineGeneration(s"$root/gens", buckets = 4)

    // ts-axis incremental snapshot (`_watermark` with tally)
    Incremental.refresh(spark, Tables.events(spark, sf),
      s"$root/snap"): Unit

    // supply mart (`_mart_meta.json` + `_watermark`)
    SupplyMart.refresh(spark,
      Tables.lineitem(spark, sf), s"$root/mart", buckets = 4): Unit

    // id-axis dedup state (`_watermark`, id semantics)
    IncrementalDedup.refresh(spark,
      Tables.documents(spark, sf).select("doc_id", "text").limit(60),
      s"$root/dedup", threshold = 0.5): Unit

    // IVF index (`_meta`)
    IvfIndex.build(Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").limit(200), "vec_id",
      s"$root/ivf", nlist = 4, m = 4, ksub = 16)

    // model artifact (`_meta`)
    ModelStore.writeMeta(spark, s"$root/model",
      Seq("kind" -> "spec", "v" -> "1"))

    // curation run (`manifest.json` + per-stage `_meta` markers)
    CurationRun.run(spark,
      Tables.documents(spark, sf).select("doc_id", "text").limit(40),
      Seq(CurationRun.Stage("keep_long",
        df => df.filter(length(col("text")) > 10))),
      s"$root/run"): Unit

    // file-stats index head (`_stats_index_ptr`) over a data dir
    Tables.nation(spark, sf).write.mode("overwrite")
      .parquet(s"$root/facts")
    graft.sources.FileStatsIndex.saveIndex(
      graft.sources.FileStatsIndex.build(spark, s"$root/facts",
        Seq("n_nationkey")), s"$root/facts")

    // the two crash markers, present as a crashed operation would
    // leave them (`_rebuild_pending`, `_pending_commit`)
    BatchedState.beginRebuild(spark, s"$root/scratch")
    BatchedState.writePointer(spark,
      new Path(s"$root/scratch2/_pending_commit"), "day=1995-01-01")

    val sites = BatchedState.migrateAll(spark, root, CommitMode.Rename)
    (root, sites)
  }

  private def payloads(sites: Seq[String]): Map[String, Option[String]] =
    sites.map(s => s -> BatchedState.readPointer(spark, new Path(s))).toMap

  test("one call flips every site class; values byte-identical; idempotent; round-trips", graft.Slow) {
    val (root, sites) = buildPopulatedRoot()
    val names = sites.map(new Path(_).getName).toSet
    assert(BatchedState.PointerSiteNames.subsetOf(names),
      s"fixture must exercise EVERY site class; missing " +
        s"${BatchedState.PointerSiteNames -- names}")
    val before = payloads(sites)
    assert(before.values.forall(_.isDefined), "every fixture site resolves")

    val migrated = BatchedState.migrateAll(spark, root, CommitMode.Manifest)
    assert(migrated == sites, "discovery must be stable across the flip")
    val hfs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    sites.foreach { s =>
      assert(hfs.getFileStatus(new Path(s)).isDirectory,
        s"$s must be a manifest directory after the flip")
    }
    assert(payloads(sites) == before, "payloads must survive byte-exact")

    // idempotent: a second sweep is a no-op with identical results
    assert(BatchedState.migrateAll(spark, root, CommitMode.Manifest) == sites)
    assert(payloads(sites) == before)

    // the store still WORKS under the flipped mode: serving reads,
    // online point reads, watermark reads
    spark.conf.set("spark.graft.commit.mode", "manifest")
    try {
      val store2 = new FeatureStore(spark, s"$root/values")
      assert(store2.loadDefs({ case "orders" => Tables.orders(spark, sf) })
        .isRight)
      val id = store2.featureVectors().select("entity_id")
        .limit(1).collect().head.getString(0)
      assert(store2.getVector(id).nonEmpty)
      assert(FeatureStore.readOnlineVectorLatest(spark, s"$root/gens", id)
        .nonEmpty)
      assert(Incremental.watermark(spark, s"$root/snap") != Long.MinValue)
      assert(IvfIndex.load(spark, s"$root/ivf").stats().nlist > 0)
      assert(ModelStore.readMeta(spark, s"$root/model", "artifact")("v") == "1")
    } finally spark.conf.unset("spark.graft.commit.mode")

    // and back: rename mode again, everything a file, payloads intact
    assert(BatchedState.migrateAll(spark, root, CommitMode.Rename) == sites)
    sites.foreach(s => assert(!hfs.getFileStatus(new Path(s)).isDirectory))
    assert(payloads(sites) == before)
  }

  test("a crash mid-sweep re-runs to completion; readers never observe unpublished", graft.Slow) {
    val (root, sites) = buildPopulatedRoot()
    val before = payloads(sites)
    // plant a hard-crashed single-site migration at one watermark:
    // stage verified, lock held, live pointer deleted — the exact
    // mid-swap-window state a killed JVM leaves
    val victim = s"$root/mart/_watermark"
    val v = BatchedState.readPointer(spark, new Path(victim)).get
    Files.write(Paths.get(s"$root/mart/._watermark.migrate"),
      BatchedState.encodePointer(v).getBytes(UTF_8)): Unit
    Files.write(Paths.get(s"$root/mart/._watermark.migrate_lock"),
      Array.empty[Byte]): Unit
    Files.deleteIfExists(Paths.get(victim)): Unit
    Files.deleteIfExists(Paths.get(s"$root/mart/._watermark.crc")): Unit

    // readers resolve the OLD value through the staged sentinel
    assert(BatchedState.readPointer(spark, new Path(victim)) == Some(v))

    // without the flag the stale lock refuses loudly, naming the site
    val e = intercept[IllegalStateException] {
      BatchedState.migrateAll(spark, root, CommitMode.Manifest)
    }
    assert(e.getMessage.contains("migration"), e.getMessage)
    // the refused sweep left every already-visited site consistent:
    // all still resolve their values
    assert(payloads(sites) == before)

    // one recovery action: re-run reclaiming stale locks — the sweep
    // completes, the crashed site finishes FROM ITS STAGE
    val migrated = BatchedState.migrateAll(spark, root, CommitMode.Manifest,
      reclaimStaleLocks = true)
    assert(migrated == sites)
    assert(payloads(sites) == before)
    val hfs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    sites.foreach(s =>
      assert(hfs.getFileStatus(new Path(s)).isDirectory, s))
    assert(!Files.exists(Paths.get(s"$root/mart/._watermark.migrate")),
      "the completed migration must drop its stage")
    assert(!Files.exists(Paths.get(s"$root/mart/._watermark.migrate_lock")),
      "the completed migration must release its lock")
  }

  test("a root-level site with BOTH a live pointer and a crash remnant is discovered once, not twice") {
    // review wave r18: the remnant branch used to anchor on the walk's
    // possibly-unqualified root Path while live entries carry
    // listStatus's qualified paths — two spellings of one site both
    // survived the de-dup set and migrated twice
    val root = java.nio.file.Files
      .createTempDirectory("graft-migrate-root").toString
    BatchedState.writePointer(spark, new Path(s"$root/_watermark"), "41 7")
    // crash-before-delete shape: stage + lock beside the LIVE pointer
    Files.write(Paths.get(s"$root/._watermark.migrate"),
      BatchedState.encodePointer("41 7").getBytes(UTF_8)): Unit
    Files.write(Paths.get(s"$root/._watermark.migrate_lock"),
      Array.empty[Byte]): Unit
    val migrated = BatchedState.migrateAll(spark, root, CommitMode.Manifest,
      reclaimStaleLocks = true)
    assert(migrated.size == 1, s"one site, one entry: $migrated")
    assert(BatchedState.readPointer(spark, new Path(s"$root/_watermark"))
      == Some("41 7"))
  }

  test("the discovery set stays in lockstep with the main-source writePointer sites") {
    // a NEW writePointer call site must register its pointer NAME in
    // PointerSiteNames or migrateAll silently skips it. Cheap source
    // cross-check: every name literal appears in main source, and the
    // call-site count is pinned — adding a site moves the count and
    // fails here, prompting the set review.
    val mainDir = Paths.get("src/main/scala")
    val sources = Files.walk(mainDir).filter(_.toString.endsWith(".scala"))
      .map[String](p => new String(Files.readAllBytes(p), UTF_8))
      .toArray.toSeq.map(_.toString)
    val all = sources.mkString("\n")
    BatchedState.PointerSiteNames.foreach(n =>
      assert(all.contains(n), s"pointer-site name $n not found in main source"))
    val callSites = sources.map(s =>
      "BatchedState\\.writePointer\\(".r.findAllIn(s).size).sum
    assert(callSites == 12,
      s"main-source writePointer call-site count moved ($callSites != 12) — " +
        "if you added a pointer site, add its NAME to " +
        "BatchedState.PointerSiteNames (and this count); BatchedState's " +
        "own internal writes (beginRebuild, the Session recursion) are " +
        "covered by the set already")
  }
}
