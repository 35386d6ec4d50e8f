package graft.registry

import graft.{SparkSpec, Tables}
import graft.operators.{BatchedState, VanishingAbstractFs, VanishingFileSystem}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** r18 directive 2 — the read-side race surface ENUMERATED, not
  * sampled. Three race shapes were found across three rounds by suite
  * timing luck (stale resolve → silent empty; UNABLE_TO_INFER_SCHEMA;
  * PATH_NOT_FOUND at DataSource resolution), each fixed by reactively
  * extending [[FeatureStore.readOnlineVectorLatest]]'s retry
  * classifier. Here the prune/migrate transition is INJECTED at every
  * step of the reader's sequence through [[VanishingFileSystem]]
  * (stat/list/open, the read-side analogue of the write-side
  * CopyDeleteFileSystem crash shim), so each interleaving is a
  * deterministic table row. The enumeration found two NEW shapes by
  * construction — a completed migratePointer swapping the pointer's
  * SHAPE (file↔directory) between a reader's stat and open/list with
  * the lock already released, which the lock-gated fallback misread as
  * "unpublished" — fixed by the no-lock re-probe in
  * [[BatchedState.readPointer]]. OnlineReadRaceSpec stays as the live
  * timing canary. */
class OnlineReadRaceEnumSpec extends SparkSpec {

  private lazy val vanishReady: Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.vanish.impl", classOf[VanishingFileSystem].getName)
    c.set("fs.AbstractFileSystem.vanish.impl",
      classOf[VanishingAbstractFs].getName)
  }

  private def deleteTree(p: String): Unit = {
    val root = Paths.get(p)
    if (Files.exists(root))
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
  }

  private def writeLatest(localBase: String, gen: String): Unit = {
    deleteTree(s"$localBase/_latest")
    Files.write(Paths.get(s"$localBase/_latest"),
      BatchedState.encodePointer(gen).getBytes(UTF_8)): Unit
  }

  /** Both generations on disk with IDENTICAL content, pointer rewound
    * to gen=0 — the instant before a publisher's prune reclaims it.
    * Returns (vanish-scheme base, local base, probe entity, expected). */
  private def publishedPair(): (String, String, String, Map[String, Any]) = {
    vanishReady
    val localRoot = Files.createTempDirectory("graft-enum").toString
    val fs = new FeatureStore(spark, s"$localRoot/values")
    fs.registerTable(TableDef("orders", Seq("o_custkey", "o_totalprice"),
      Map("o_totalprice" -> "numeric")), Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(fs.computeVersion("total_spend", "v1").isRight)
    val id = fs.featureVectors().select("entity_id")
      .limit(1).collect().head.getString(0)
    val base = s"vanish:$localRoot/gens"
    fs.publishOnlineGeneration(base, buckets = 4) // gen=0
    fs.publishOnlineGeneration(base, buckets = 4) // gen=1, pointer → gen=1
    writeLatest(s"$localRoot/gens", "gen=0")      // rewind: reader will resolve gen=0
    val expected = FeatureStore.readOnlineVectorLatest(spark, base, id)
    assert(expected.nonEmpty)
    (base, s"$localRoot/gens", id, expected)
  }

  /** The prune completing at exactly this moment: pointer advances to
    * gen=1 and gen=0 vanishes whole. */
  private def pruneNow(localBase: String): Unit = {
    writeLatest(localBase, "gen=1")
    deleteTree(s"$localBase/gen=0")
  }

  // ---- reader vs PRUNE: one row per read step --------------------------

  for ((step, marker, what) <- Seq(
      ("stat", "gen=0/_online_meta.json",
        "generation vanishes before the meta existence probe"),
      ("open", "gen=0/_online_meta.json",
        "generation vanishes between the meta stat and its open"),
      ("stat", "gen=0/bucket=",
        "generation vanishes before the bucket-dir existence probe (the silent-empty shape)"),
      ("list", "gen=0/bucket=",
        "generation vanishes at DataSource path listing (the PATH_NOT_FOUND shape)"),
      ("open", "gen=0/bucket=",
        "generation vanishes between listing and the parquet file open")))
    test(s"prune interleaving: $what — the read retries to the new generation") {
      val (base, localBase, id, expected) = publishedPair()
      val before = VanishingFileSystem.fired.get()
      VanishingFileSystem.arm(step, marker)(pruneNow(localBase))
      try {
        assert(FeatureStore.readOnlineVectorLatest(spark, base, id) == expected,
          s"read through a $step-step prune must retry to gen=1, exactly")
        assert(VanishingFileSystem.fired.get() == before + 1,
          s"the armed $step trap never fired — this interleaving was not exercised")
      } finally VanishingFileSystem.disarm()
    }

  test("prune interleaving: files deleted under a still-listed directory (the UNABLE_TO_INFER_SCHEMA shape)") {
    val (base, localBase, id, expected) = publishedPair()
    val before = VanishingFileSystem.fired.get()
    // mid-recursive-delete: every parquet file of gen=0 is gone but the
    // directory skeleton still lists; the pointer has already advanced
    VanishingFileSystem.arm("list", "gen=0/bucket=") {
      writeLatest(localBase, "gen=1")
      Files.walk(Paths.get(s"$localBase/gen=0"))
        .filter(p => p.toString.endsWith(".parquet"))
        .forEach(p => Files.delete(p))
    }
    try {
      assert(FeatureStore.readOnlineVectorLatest(spark, base, id) == expected)
      assert(VanishingFileSystem.fired.get() == before + 1)
    } finally VanishingFileSystem.disarm()
  }

  // ---- reader vs MIGRATE: the pointer itself changes under the read ----

  private def encPtr(v: String): Array[Byte] =
    BatchedState.encodePointer(v).getBytes(UTF_8)

  /** migratePointer mid-swap-window: stage verified, lock held, live
    * pointer already deleted. */
  private def migrationWindowNow(localBase: String): Unit = {
    Files.write(Paths.get(s"$localBase/._latest.migrate"), encPtr("gen=0")): Unit
    Files.write(Paths.get(s"$localBase/._latest.migrate_lock"),
      Array.empty[Byte]): Unit
    Files.delete(Paths.get(s"$localBase/_latest"))
  }

  for ((step, what) <- Seq(
      ("stat", "pointer vanishes before the reader's stat"),
      ("open", "pointer vanishes between the reader's stat and open")))
    test(s"migrate interleaving (mid-swap-window): $what — the staged value serves") {
      val (base, localBase, id, expected) = publishedPair()
      val before = VanishingFileSystem.fired.get()
      VanishingFileSystem.arm(step, "_latest")(migrationWindowNow(localBase))
      try {
        assert(FeatureStore.readOnlineVectorLatest(spark, base, id) == expected,
          "a reader inside the migration swap window must resolve the staged OLD value")
        assert(VanishingFileSystem.fired.get() == before + 1)
      } finally {
        VanishingFileSystem.disarm()
        Files.deleteIfExists(Paths.get(s"$localBase/._latest.migrate")): Unit
        Files.deleteIfExists(Paths.get(s"$localBase/._latest.migrate_lock")): Unit
      }
    }

  test("migrate interleaving (COMPLETED, file→directory): the shape-change re-probe resolves — race shape four") {
    val (base, localBase, id, expected) = publishedPair()
    val before = VanishingFileSystem.fired.get()
    // between the reader's stat (saw a FILE) and its open, the whole
    // migration lands: file deleted, manifest directory built, stage
    // dropped, lock released. The open dies FileNotFound; the lock is
    // GONE, so before r18 the fallback returned None and the serving
    // path misreported "never published".
    VanishingFileSystem.arm("open", "_latest") {
      Files.delete(Paths.get(s"$localBase/_latest"))
      Files.createDirectories(Paths.get(s"$localBase/_latest")): Unit
      Files.write(
        Paths.get(f"$localBase/_latest/manifest-${0L}%020d"),
        encPtr("gen=0")): Unit
    }
    try {
      assert(FeatureStore.readOnlineVectorLatest(spark, base, id) == expected,
        "a reader racing a COMPLETED file→dir migration must re-probe and resolve")
      assert(VanishingFileSystem.fired.get() == before + 1)
    } finally VanishingFileSystem.disarm()
  }

  test("migrate interleaving (COMPLETED, directory→file): the shape-change re-probe resolves — race shape five") {
    val (base, localBase, id, expected) = publishedPair()
    // start from a manifest-mode pointer (the completed forward
    // migration), reader mid-readManifestDir when the REVERSE
    // migration lands: dir gone, file pointer in place. The manifest
    // open dies FileNotFound, the re-list finds nothing (it is a file
    // now), the first pass resolves None with no exception — the
    // second new shape the enumeration surfaced.
    deleteTree(s"$localBase/_latest")
    Files.createDirectories(Paths.get(s"$localBase/_latest")): Unit
    Files.write(Paths.get(f"$localBase/_latest/manifest-${0L}%020d"),
      encPtr("gen=0")): Unit
    val before = VanishingFileSystem.fired.get()
    VanishingFileSystem.arm("open", "manifest-") {
      deleteTree(s"$localBase/_latest")
      Files.write(Paths.get(s"$localBase/_latest"), encPtr("gen=0")): Unit
    }
    try {
      assert(FeatureStore.readOnlineVectorLatest(spark, base, id) == expected,
        "a reader racing a COMPLETED dir→file migration must re-probe and resolve")
      assert(VanishingFileSystem.fired.get() == before + 1)
    } finally VanishingFileSystem.disarm()
  }

  test("prune during a migration swap window keeps the staged target alive") {
    val (base, localBase, id, expected) = publishedPair()
    migrationWindowNow(localBase)
    try {
      // prune resolves the pointer THROUGH the staged value, so gen=0
      // (the staged target) must survive even keep=1
      FeatureStore.pruneOnlineGenerations(spark, base, keep = 1): Unit
      assert(Files.exists(Paths.get(s"$localBase/gen=0")),
        "prune must never reclaim the generation the staged pointer serves")
      assert(FeatureStore.readOnlineVectorLatest(spark, base, id) == expected)
    } finally {
      Files.deleteIfExists(Paths.get(s"$localBase/._latest.migrate")): Unit
      Files.deleteIfExists(Paths.get(s"$localBase/._latest.migrate_lock")): Unit
      writeLatest(localBase, "gen=0")
    }
  }

  test("a genuinely deleted pointer still reads as absent (the re-probe must not resurrect)") {
    val (base, localBase, _, _) = publishedPair()
    // decertify semantics: deletePointer removes pointer AND stage; a
    // later read must be a loud "never published", not a value
    BatchedState.deletePointer(spark,
      new org.apache.hadoop.fs.Path(s"$localBase/_latest"))
    val e = intercept[IllegalArgumentException] {
      FeatureStore.resolveOnlineLatest(spark, base)
    }
    assert(e.getMessage.contains("no _latest pointer"))
  }
}
