package graft.operators

import graft.{SparkSpec, Tables}
import graft.registry.{FeatureDef, FeatureStore, TableDef}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The object-store commit seam (r15 verdict item 1): every pointer
  * swap in the repo was rename-based — atomic on local/HDFS, documented
  * non-atomic on object stores, where G43's checksums DETECT a torn
  * pointer but nothing prevents one. [[CommitMode.Manifest]] is the
  * prevention: create-new numbered manifests, readers resolve the max
  * complete one, no rename anywhere on the commit path. This spec
  * drives publish/read/prune through a simulated copy+delete-rename
  * filesystem ([[CopyDeleteFileSystem]]) and pins: rename mode
  * exhibits both real failure shapes there (lost + torn), manifest
  * mode exhibits neither and performs ZERO renames, and the online
  * generation publish serves identical vectors in either mode. */
class CommitModeSpec extends SparkSpec {

  private lazy val cdfsReady: Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.cdfs.impl", classOf[CopyDeleteFileSystem].getName)
    c.set("fs.AbstractFileSystem.cdfs.impl",
      classOf[CopyDeleteAbstractFs].getName)
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-commit-$tag").toString

  test("rename mode on a copy+delete filesystem: a crashed swap loses or tears the pointer") {
    cdfsReady
    // lost: the swap's delete landed, its copy never started
    val lostPtr = new Path(s"cdfs:${tmp("lost")}/_latest")
    BatchedState.writePointer(spark, lostPtr, "gen=1")
    assert(BatchedState.readPointer(spark, lostPtr) === Some("gen=1"))
    CopyDeleteFileSystem.armCrash(0)
    intercept[java.io.IOException] {
      BatchedState.writePointer(spark, lostPtr, "gen=2")
    }
    assert(BatchedState.readPointer(spark, lostPtr) === None,
      "the pointer should read as ABSENT — the lost-pointer failure " +
        "shape manifest mode exists to remove")

    // torn: the copy stopped mid-payload — G2 detects it loudly, but
    // the pointer is still unreadable until an operator restores it
    val tornPtr = new Path(s"cdfs:${tmp("torn")}/_latest")
    BatchedState.writePointer(spark, tornPtr, "gen=1")
    CopyDeleteFileSystem.armCrash(9)
    intercept[java.io.IOException] {
      BatchedState.writePointer(spark, tornPtr, "gen=2")
    }
    val e = intercept[IllegalStateException] {
      BatchedState.readPointer(spark, tornPtr)
    }
    assert(e.getMessage.contains("torn"), e.getMessage)
  }

  test("manifest mode: publish/read/prune over copy+delete rename with zero renames and zero lost pointers") {
    cdfsReady
    val dir = tmp("manifest")
    val ptr = new Path(s"cdfs:$dir/_latest")
    val renamesBefore = CopyDeleteFileSystem.renames.get()
    // arm a crash that would fire on the NEXT rename: if the manifest
    // commit path ever renamed, this would detonate it
    CopyDeleteFileSystem.armCrash(0)
    for (i <- 1 to 12) {
      BatchedState.writePointer(spark, ptr, s"gen=$i", CommitMode.Manifest)
      assert(BatchedState.readPointer(spark, ptr) === Some(s"gen=$i"),
        s"commit $i did not resolve")
    }
    assert(CopyDeleteFileSystem.renames.get() === renamesBefore,
      "manifest mode performed a rename — its commit path must not")
    CopyDeleteFileSystem.armCrash(-1) // disarm for later tests
    val files = new java.io.File(s"$dir/_latest").listFiles()
      .map(_.getName).filter(_.startsWith("manifest-")).sorted
    assert(files.length <= BatchedState.KeepManifests,
      s"prune did not bound the manifest count: ${files.length}")
    assert(files.length >= 2, "prune over-reclaimed")

    // an interrupted writer's torn in-flight manifest (a partial
    // upload at max+1) is SKIPPED: the previous commit stays served
    val maxN = files.last.stripPrefix("manifest-").toLong
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_latest/manifest-${"%020d".format(maxN + 1)}"),
      "G2|5|deadbeef|ge".getBytes("UTF-8"))
    assert(BatchedState.readPointer(spark, ptr) === Some("gen=12"),
      "a torn in-flight manifest must not hide the last complete commit")

    // and a retry writer commits PAST the torn number, never over it
    BatchedState.writePointer(spark, ptr, "gen=13", CommitMode.Manifest)
    assert(BatchedState.readPointer(spark, ptr) === Some("gen=13"))
  }

  test("manifest mode edges: empty dir, torn first commit, create-new race, mode mixing") {
    cdfsReady
    val dir = tmp("edges")
    val ptr = new Path(s"$dir/_latest")
    val hfs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.mkdirs(ptr): Unit
    assert(BatchedState.readPointer(spark, ptr) === None,
      "an empty manifest directory is an unpublished pointer, not an error")

    // a crashed FIRST commit (only manifest torn, nothing complete)
    // reads as unpublished — rename mode's twin (tmp written, dst never
    // swapped) also reads None, and 'restore the last completed
    // publish' would prescribe the impossible (review wave r16)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_latest/manifest-${"%020d".format(0L)}"),
      "G2|40|0|trunc".getBytes("UTF-8"))
    assert(BatchedState.readPointer(spark, ptr) === None,
      "a torn first commit must read as never-published")
    // and the retry commits PAST the torn number and serves
    BatchedState.writePointer(spark, ptr, "gen=0", CommitMode.Manifest)
    assert(BatchedState.readPointer(spark, ptr) === Some("gen=0"))

    // two writers racing to one number: the loser fails loudly
    BatchedState.createManifest(spark, ptr, 7L, "gen=a")
    val race = intercept[IllegalStateException] {
      BatchedState.createManifest(spark, ptr, 7L, "gen=b")
    }
    assert(race.getMessage.contains("concurrent"), race.getMessage)

    // a rename-mode FILE refuses a manifest-mode write: one mode per
    // pointer path for its lifetime
    val filePtr = new Path(s"$dir/_file")
    BatchedState.writePointer(spark, filePtr, "gen=1")
    val mix = intercept[IllegalStateException] {
      BatchedState.writePointer(spark, filePtr, "gen=2", CommitMode.Manifest)
    }
    assert(mix.getMessage.contains("rename-mode"), mix.getMessage)
  }

  test("the session knob flips every pointer site: a full incremental cycle runs manifest-mode") {
    // spark.graft.commit.mode=manifest routes the writePointer DEFAULT
    // (CommitMode.Session) at all seven pointer sites — one deployment
    // knob, no per-call plumbing. The heaviest consumer is the
    // watermark+tally protocol: run a real ts-axis incremental cycle
    // (refresh / audit / crash-retry / reconcile) entirely under it.
    import graft.registry.Incremental
    val events = graft.Tables.events(spark, sf)
    val tsUs = unix_micros(col("ts"))
    val bound = events.select(tsUs.as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0).head.toLong
    spark.conf.set("spark.graft.commit.mode", "manifest")
    try {
      val p = java.nio.file.Files
        .createTempDirectory("graft-commit-knob").toString + "/snap"
      // out-of-order feed: late half first, then the full log
      Incremental.refresh(spark, events.filter(tsUs > bound), p): Unit
      assert(new java.io.File(s"$p/_watermark").isDirectory,
        "the watermark must commit as a manifest directory under the knob")
      val r = Incremental.refresh(spark, events, p)
      assert(r.lateRows === events.filter(tsUs <= bound).count())
      assert(Incremental.reconcile(spark, events, p) > 0)
      val after = Incremental.refresh(spark, events, p)
      assert(after.lateRows === 0L && after.touched === 0)
      // content identical to a rename-mode twin
      spark.conf.unset("spark.graft.commit.mode")
      val twin = java.nio.file.Files
        .createTempDirectory("graft-commit-knob-twin").toString + "/snap"
      Incremental.refresh(spark, events, twin): Unit
      def rows(path: String) = Incremental.read(spark, path)
        .collect().map(_.toSeq).toSet
      assert(rows(p) === rows(twin))

      // the layout meta rides the knob too (review wave 2: it was a
      // hand-rolled rename swap the knob silently skipped)
      spark.conf.set("spark.graft.commit.mode", "manifest")
      val mart = java.nio.file.Files
        .createTempDirectory("graft-commit-knob-mart").toString + "/mart"
      val li = graft.Tables.lineitem(spark, sf).limit(3000)
      SupplyMart.refresh(spark, li, mart, buckets = 4): Unit
      assert(new java.io.File(s"$mart/_mart_meta.json").isDirectory,
        "_mart_meta.json must commit as a manifest directory under the knob")
      // and the recorded count reads back through the directory
      SupplyMart.refresh(spark, li, mart, buckets = 64): Unit
      assert(new java.io.File(mart).listFiles
        .count(f => f.isDirectory && f.getName.startsWith("bucket=")) <= 4)

      // flipping the knob over an EXISTING rename-mode pointer refuses
      // loudly at the first write (one mode per pointer path) — never
      // silent corruption (direct pointer write: a refresh whose
      // watermark is already current early-outs before writing)
      val e = intercept[IllegalStateException] {
        BatchedState.writePointer(spark, new Path(s"$twin/_watermark"),
          "999")
      }
      assert(e.getMessage.contains("rename-mode"), e.getMessage)
      // ... and BEFORE any heavy work at the protocol entry (review
      // wave 2: the watermark write came after the partition
      // overwrite, so the refusal used to fire only post-overwrite)
      val eProbe = intercept[IllegalStateException] {
        Incremental.refresh(spark, events, twin)
      }
      assert(eProbe.getMessage.contains("rename-mode pointer FILE"),
        eProbe.getMessage)

      // the symmetric direction: a rename-mode (knob unset) write onto
      // a manifest DIRECTORY refuses with guidance, never a raw FS
      // error — and never a silent mode flip
      spark.conf.unset("spark.graft.commit.mode")
      val eDir = intercept[IllegalStateException] {
        BatchedState.writePointer(spark, new Path(s"$p/_watermark"), "1")
      }
      assert(eDir.getMessage.contains("DIRECTORY"), eDir.getMessage)
      val eDirProbe = intercept[IllegalStateException] {
        Incremental.refresh(spark, events, p)
      }
      assert(eDirProbe.getMessage.contains("DIRECTORY"), eDirProbe.getMessage)
      spark.conf.set("spark.graft.commit.mode", "manifest")

      spark.conf.set("spark.graft.commit.mode", "bogus")
      val e2 = intercept[IllegalArgumentException] {
        BatchedState.writePointer(spark,
          new Path(s"$twin/_other_pointer"), "x")
      }
      assert(e2.getMessage.contains("bogus"), e2.getMessage)
    } finally spark.conf.unset("spark.graft.commit.mode")
  }

  test("the four write-once artifact manifests ride the knob: zero renames, torn first commit unpublished, legacy files load") {
    // r16 verdict item 1 / r17 directive 1: IvfIndex `_meta`,
    // TokenizerArtifact/ModelStore `_meta`, CurationRun's run
    // manifest, and `_online_meta.json` used to swap via
    // atomicReplace directly — on an object store with the knob set
    // they still renamed. Now every one rides writePointer/readPointer.
    cdfsReady
    val dir = tmp("artifacts")
    import org.apache.spark.sql.functions.col

    spark.conf.set("spark.graft.commit.mode", "manifest")
    try {
      // --- ModelStore _meta through the copy+delete FS: an armed
      // crash detonates on the FIRST rename, so a green pass proves
      // the commit path performs none
      val renamesBefore = CopyDeleteFileSystem.renames.get()
      CopyDeleteFileSystem.armCrash(0)
      val mPath = s"cdfs:$dir/model"
      ModelStore.writeMeta(spark, mPath, Seq("kind" -> "x", "v" -> "1"))
      ModelStore.writeMeta(spark, mPath, Seq("kind" -> "x", "v" -> "2"))
      assert(ModelStore.readMeta(spark, mPath, "artifact")("v") === "2")
      assert(CopyDeleteFileSystem.renames.get() === renamesBefore,
        "ModelStore _meta performed a rename under the manifest knob")
      CopyDeleteFileSystem.armCrash(-1)
      assert(new java.io.File(s"$dir/model/_meta").isDirectory)
      // decertify removes the whole marker directory
      ModelStore.deleteMeta(spark, mPath)
      assert(ModelStore.readMetaOpt(spark, mPath).isEmpty)

      // --- a torn FIRST _meta commit reads as never-saved, not an
      // error prescribing an impossible restore
      val tPath = s"$dir/torn-artifact"
      assert(new java.io.File(s"$tPath/_meta").mkdirs())
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tPath/_meta/manifest-${"%020d".format(0L)}"),
        "G2|40|0|kind=x".getBytes("UTF-8"))
      assert(ModelStore.readMetaOpt(spark, tPath).isEmpty,
        "a torn first _meta commit must read as never-saved")
      // ... and the retry SAVE is not bricked by it (review wave r17:
      // nextGen used a raw exists() — true for the torn directory —
      // then threw on the read, permanently blocking every retry)
      assert(ModelStore.nextGen(spark, tPath) === 0L,
        "a crashed first commit must retry at gen 0, not throw")
      ModelStore.writeMeta(spark, tPath, Seq("kind" -> "x", "gen" -> "0"))
      assert(ModelStore.nextGen(spark, tPath) === 1L)

      // --- IvfIndex: build + add + query entirely under the knob
      val vecs = graft.Tables.embeddings(spark, sf)
        .select("vec_id", "embedding").limit(300)
      val ivfPath = s"$dir/ivf"
      IvfIndex.build(vecs.filter(col("vec_id") < 200), "vec_id", ivfPath,
        nlist = 4)
      assert(new java.io.File(s"$ivfPath/_meta").isDirectory,
        "IvfIndex _meta must commit as a manifest directory under the knob")
      val idx = IvfIndex.load(spark, ivfPath)
      assert(idx.add(vecs.filter(col("vec_id") >= 200), "vec_id") > 0)
      val probe = vecs.filter(col("vec_id") === 0)
      assert(IvfIndex.load(spark, ivfPath)
        .topK(probe, "vec_id", k = 3, nprobe = 4).count() > 0)

      // --- CurationRun: stage markers + run manifest under the knob;
      // resume reuses the committed stage; gc honors the manifest
      val docs = graft.Tables.documents(spark, sf)
        .select("doc_id", "text").limit(50)
      val wd = s"$dir/curation"
      val stages = Seq(CurationRun.Stage("keep_short",
        df => df.filter(org.apache.spark.sql.functions.length(col("text")) > 10)))
      val (_, rep1) = CurationRun.run(spark, docs, stages, wd)
      assert(!rep1.head.reused)
      assert(new java.io.File(s"$wd/manifest.json").isDirectory,
        "the run manifest must commit as a manifest directory under the knob")
      assert(new java.io.File(s"$wd/stage_0_keep_short/_meta").isDirectory)
      val (_, rep2) = CurationRun.run(spark, docs, stages, wd)
      assert(rep2.head.reused, "resume must reuse the committed stage")
      assert(CurationRun.gc(spark, wd).isEmpty,
        "gc must read the manifest-mode run manifest and keep live dirs")

      // --- publishOnlineView's _online_meta.json
      val fsStore = new FeatureStore(spark, s"$dir/values")
      fsStore.registerTable(TableDef("orders",
        Seq("o_custkey", "o_totalprice"),
        Map("o_totalprice" -> "numeric")), Tables.orders(spark, sf))
      fsStore.defineFeature(FeatureDef("total_spend", "orders", "numeric",
        df => df.groupBy(col("o_custkey").as("entity_id"))
          .agg(org.apache.spark.sql.functions.sum("o_totalprice").as("value"))))
      assert(fsStore.computeVersion("total_spend", "v1").isRight)
      val viewPath = s"$dir/online-view"
      assert(fsStore.publishOnlineView(viewPath, buckets = 4) > 0)
      assert(new java.io.File(s"$viewPath/_online_meta.json").isDirectory,
        "_online_meta.json must commit as a manifest directory under the knob")
      assert(FeatureStore.onlineBuckets(spark, viewPath) === 4)
    } finally spark.conf.unset("spark.graft.commit.mode")

    // --- legacy rename-mode artifacts load unmigrated (bare k=v file)
    val legacy = s"$dir/legacy"
    assert(new java.io.File(legacy).mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$legacy/_meta"),
      "kind=x\nv=7\n".getBytes("UTF-8"))
    assert(ModelStore.readMeta(spark, legacy, "artifact")("v") === "7",
      "a legacy bare k=v _meta must parse through readPointer")

    // --- the migrated sites refuse a mode mismatch BEFORE their heavy
    // work (review wave r17 — the r16-ADVICE shape, re-checked here):
    // a legacy rename-mode IvfIndex under the manifest knob refuses at
    // the writer-lock probe, before any batch is encoded or written
    val vecs2 = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").limit(200)
    val legacyIvf = s"$dir/legacy-ivf"
    IvfIndex.build(vecs2.filter(col("vec_id") < 100), "vec_id", legacyIvf,
      nlist = 4) // knob unset: rename-mode _meta file
    val batchDirs = () => Option(new java.io.File(s"$legacyIvf/codes")
      .listFiles()).getOrElse(Array.empty).count(_.getName.startsWith("batch="))
    val before = batchDirs()
    spark.conf.set("spark.graft.commit.mode", "manifest")
    val eAdd = try intercept[IllegalStateException] {
      IvfIndex.load(spark, legacyIvf)
        .add(vecs2.filter(col("vec_id") >= 100), "vec_id")
    } finally spark.conf.unset("spark.graft.commit.mode")
    assert(eAdd.getMessage.contains("rename-mode"), eAdd.getMessage)
    assert(batchDirs() === before,
      "the mode probe must refuse before any batch directory is written")
    // ModelStore saves share the probe via withLock
    val eSave = try {
      spark.conf.set("spark.graft.commit.mode", "manifest")
      intercept[IllegalStateException] {
        ModelStore.withLock(spark, legacy, "probe") { fail("body ran") }
      }
    } finally spark.conf.unset("spark.graft.commit.mode")
    assert(eSave.getMessage.contains("rename-mode"), eSave.getMessage)
  }

  test("online generation publish serves identically in both commit modes") {
    val dir = tmp("store")
    val fs = new FeatureStore(spark, s"$dir/values")
    fs.registerTable(TableDef("orders", Seq("o_custkey", "o_totalprice"),
      Map("o_totalprice" -> "numeric")), Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(fs.computeVersion("total_spend", "v1").isRight)
    val ids = fs.featureVectors().select("entity_id")
      .limit(3).collect().map(_.getString(0)).toSeq

    val renameBase = s"$dir/gens-rename"
    val manifestBase = s"$dir/gens-manifest"
    fs.publishOnlineGeneration(renameBase, buckets = 4)
    fs.publishOnlineGeneration(manifestBase, buckets = 4,
      mode = CommitMode.Manifest)
    assert(new java.io.File(s"$manifestBase/_latest").isDirectory,
      "manifest-mode _latest must be a manifest directory")
    assert(new java.io.File(s"$renameBase/_latest").isFile)
    // the EXPLICIT mode reaches the generation's _online_meta.json too
    // (review wave r17: it used to follow the session knob only, so a
    // mode=Manifest publish left this one commit on the rename path)
    assert(new java.io.File(FeatureStore.resolveOnlineLatest(spark,
      manifestBase) + "/_online_meta.json").isDirectory,
      "the explicit publish mode must govern _online_meta.json")
    ids.foreach { id =>
      val viaRename = FeatureStore.readOnlineVectorLatest(spark, renameBase, id)
      val viaManifest = FeatureStore.readOnlineVectorLatest(spark, manifestBase, id)
      assert(viaRename.nonEmpty)
      assert(viaRename === viaManifest, s"modes diverged for $id")
    }

    // the session knob governs this publish when no explicit mode is
    // passed (review wave 2: the hardcoded Rename default silently
    // overrode the knob at exactly the pointer the object-store
    // guidance targets)
    val knobBase = s"$dir/gens-knob"
    spark.conf.set("spark.graft.commit.mode", "manifest")
    try fs.publishOnlineGeneration(knobBase, buckets = 4)
    finally spark.conf.unset("spark.graft.commit.mode")
    assert(new java.io.File(s"$knobBase/_latest").isDirectory,
      "the session knob must govern the default-mode publish")
    ids.foreach { id =>
      assert(FeatureStore.readOnlineVectorLatest(spark, knobBase, id)
        === FeatureStore.readOnlineVectorLatest(spark, renameBase, id))
    }

    // a mode-mismatched publish refuses BEFORE computing the
    // generation (ADVICE r16: the refusal used to fire only at the
    // _latest write, after the full bucketed generation was written —
    // every retry re-paid the publish and stranded an orphan gen=<n>
    // directory pruneOnlineGenerations never reclaims)
    val gensBefore = new java.io.File(knobBase).listFiles()
      .count(_.getName.startsWith("gen="))
    val eProbe = intercept[IllegalStateException] {
      fs.publishOnlineGeneration(knobBase, buckets = 4,
        mode = CommitMode.Rename)
    }
    assert(eProbe.getMessage.contains("DIRECTORY"), eProbe.getMessage)
    assert(new java.io.File(knobBase).listFiles()
      .count(_.getName.startsWith("gen=")) === gensBefore,
      "the probe must refuse before any generation directory is written")

    // a second manifest-mode publish advances the pointer and pruning
    // reclaims superseded generations exactly as in rename mode
    fs.publishOnlineGeneration(manifestBase, buckets = 4,
      mode = CommitMode.Manifest)
    assert(FeatureStore.resolveOnlineLatest(spark, manifestBase)
      .endsWith("gen=1"))
    fs.publishOnlineGeneration(manifestBase, buckets = 4,
      mode = CommitMode.Manifest)
    val doomed = FeatureStore.pruneOnlineGenerations(spark, manifestBase,
      keep = 2)
    assert(doomed === Seq("gen=0"))
    ids.foreach { id =>
      assert(FeatureStore.readOnlineVectorLatest(spark, manifestBase, id)
        === FeatureStore.readOnlineVectorLatest(spark, renameBase, id))
    }
  }
}
