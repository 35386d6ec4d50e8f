package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The pointer mode-migration verb (r17 directive 3): a deployment
  * flipping `spark.graft.commit.mode` over existing state used to have
  * one remedy — re-publish everything under fresh paths. `migratePointer`
  * converts a pointer in place, and the contract pinned here is the
  * directive's: the payload survives byte-exactly in both directions,
  * the verb performs ZERO renames of its own (counter-asserted through
  * the copy+delete shim), and a crash at EVERY intermediate state
  * either retries to completion or leaves readers resolving the OLD
  * value — never neither. The absence window of the rename→manifest
  * direction (a file and a directory cannot share a path) is closed by
  * the `.name.migrate` stage sentinel readPointer honors. */
class MigratePointerSpec extends SparkSpec {

  private lazy val cdfsReady: Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.cdfs.impl", classOf[CopyDeleteFileSystem].getName)
    c.set("fs.AbstractFileSystem.cdfs.impl",
      classOf[CopyDeleteAbstractFs].getName)
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mig-$tag").toString

  private def stageOf(ptr: Path): java.io.File =
    new java.io.File(s"${ptr.getParent.toUri.getPath}/.${ptr.getName}.migrate")

  test("both directions migrate byte-exactly with zero renames, and the new mode keeps committing") {
    cdfsReady
    val dir = tmp("both")

    // rename → manifest, driven through the copy+delete filesystem
    // with a crash armed on the next rename: a migration that renamed
    // ANYTHING would detonate it
    val p1 = new Path(s"cdfs:$dir/_wm")
    BatchedState.writePointer(spark, p1, "1754900000000 42")
    val renamesBefore = CopyDeleteFileSystem.renames.get()
    CopyDeleteFileSystem.armCrash(0)
    BatchedState.migratePointer(spark, p1, CommitMode.Manifest)
    assert(CopyDeleteFileSystem.renames.get() === renamesBefore,
      "migratePointer performed a rename — its protocol must not")
    CopyDeleteFileSystem.armCrash(-1)
    assert(new java.io.File(s"$dir/_wm").isDirectory)
    assert(BatchedState.readPointer(spark, p1) === Some("1754900000000 42"),
      "payload must survive byte-exactly")
    assert(!stageOf(p1).exists(), "the stage must be cleaned up")
    // the migrated pointer accepts manifest-mode commits (and refuses
    // rename-mode ones — the one-mode-per-path guard now protects the
    // NEW mode)
    BatchedState.writePointer(spark, p1, "1754900000001 43", CommitMode.Manifest)
    assert(BatchedState.readPointer(spark, p1) === Some("1754900000001 43"))
    intercept[IllegalStateException] {
      BatchedState.writePointer(spark, p1, "x", CommitMode.Rename)
    }

    // manifest → rename, same zero-rename assertion
    val p2 = new Path(s"cdfs:$dir/_head")
    BatchedState.writePointer(spark, p2, "gen=7", CommitMode.Manifest)
    BatchedState.writePointer(spark, p2, "gen=8", CommitMode.Manifest)
    CopyDeleteFileSystem.armCrash(0)
    BatchedState.migratePointer(spark, p2, CommitMode.Rename)
    assert(CopyDeleteFileSystem.renames.get() === renamesBefore)
    CopyDeleteFileSystem.armCrash(-1)
    assert(new java.io.File(s"$dir/_head").isFile)
    assert(BatchedState.readPointer(spark, p2) === Some("gen=8"),
      "the HIGHEST complete manifest is the migrated value")
    BatchedState.writePointer(spark, p2, "gen=9")
    assert(BatchedState.readPointer(spark, p2) === Some("gen=9"))

    // already in the target mode: idempotent no-op
    BatchedState.migratePointer(spark, p2, CommitMode.Rename)
    assert(BatchedState.readPointer(spark, p2) === Some("gen=9"))

    // Session target resolves the knob
    val p3 = new Path(s"$dir/_knob")
    BatchedState.writePointer(spark, p3, "v1")
    spark.conf.set("spark.graft.commit.mode", "manifest")
    try BatchedState.migratePointer(spark, p3, CommitMode.Session)
    finally spark.conf.unset("spark.graft.commit.mode")
    assert(new java.io.File(s"$dir/_knob").isDirectory)
    assert(BatchedState.readPointer(spark, p3) === Some("v1"))
  }

  test("every crash point: readers resolve the OLD value and a re-run completes — never neither") {
    val dir = tmp("crash")
    val hfs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // helper: a fresh rename-mode pointer with a known value
    def freshPtr(name: String): Path = {
      val p = new Path(s"$dir/$name")
      BatchedState.writePointer(spark, p, "old-value")
      p
    }
    // a hard-crashed migration leaves BOTH the stage and the migrate
    // lock — the reader fallback is lock-GATED (an orphaned stage
    // alone is inert), so every crash construction plants the lock,
    // and recovery = remove the stale lock + re-run, as documented
    def plantLock(name: String): Unit =
      hfs.create(new Path(s"$dir/.$name.migrate_lock"), true).close()
    def recover(name: String, p: Path, to: CommitMode): Unit = {
      hfs.delete(new Path(s"$dir/.$name.migrate_lock"), false): Unit
      BatchedState.migratePointer(spark, p, to)
    }

    // crash point A: stage written (complete), old pointer untouched.
    // Readers see the pointer; re-run re-stages and completes.
    val a = freshPtr("_a")
    val aStage = new Path(s"$dir/._a.migrate")
    hfs.mkdirs(aStage): Unit
    BatchedState.createManifest(spark, aStage, 0L, "old-value")
    plantLock("_a")
    assert(BatchedState.readPointer(spark, a) === Some("old-value"))
    recover("_a", a, CommitMode.Manifest)
    assert(new java.io.File(s"$dir/_a").isDirectory)
    assert(BatchedState.readPointer(spark, a) === Some("old-value"))
    assert(!stageOf(a).exists())

    // crash point B: stage complete, pointer DELETED (the absence
    // window). Readers fall back to the stage; re-run completes.
    val b = freshPtr("_b")
    val bStage = new Path(s"$dir/._b.migrate")
    hfs.mkdirs(bStage): Unit
    BatchedState.createManifest(spark, bStage, 0L, "old-value")
    plantLock("_b")
    hfs.delete(b, false): Unit
    assert(BatchedState.readPointer(spark, b) === Some("old-value"),
      "mid-window readers must resolve the staged OLD value")
    recover("_b", b, CommitMode.Manifest)
    assert(new java.io.File(s"$dir/_b").isDirectory)
    assert(BatchedState.readPointer(spark, b) === Some("old-value"))

    // crash point C: stage complete, pointer rebuilt as a manifest DIR
    // but its manifest-0 is TORN (crash mid-in-place-build). Readers
    // skip the torn manifest and fall back to the stage; re-run
    // finishes the build.
    val c = freshPtr("_c")
    val cStage = new Path(s"$dir/._c.migrate")
    hfs.mkdirs(cStage): Unit
    BatchedState.createManifest(spark, cStage, 0L, "old-value")
    plantLock("_c")
    hfs.delete(c, false): Unit
    hfs.mkdirs(c): Unit
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_c/manifest-${"%020d".format(0L)}"),
      "G2|40|0|old".getBytes("UTF-8"))
    assert(BatchedState.readPointer(spark, c) === Some("old-value"),
      "a torn in-place build must not hide the staged value")
    recover("_c", c, CommitMode.Manifest)
    assert(BatchedState.readPointer(spark, c) === Some("old-value"))
    assert(!stageOf(c).exists())

    // crash point D (manifest→rename): stage complete as a FILE, the
    // pointer torn mid-create. Readers rescue from the stage; re-run
    // rewrites the file from it.
    val d = new Path(s"$dir/_d")
    BatchedState.writePointer(spark, d, "old-value", CommitMode.Manifest)
    val dStage = new Path(s"$dir/._d.migrate")
    val out = hfs.create(dStage, true)
    out.write(BatchedState.encodePointer("old-value").getBytes("UTF-8"))
    out.close()
    plantLock("_d")
    hfs.delete(d, true): Unit
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_d"),
      "G2|40|deadbeef|old-va".getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/._d.crc"))
    assert(BatchedState.readPointer(spark, d) === Some("old-value"),
      "a torn rebuilt file must not hide the staged value")
    recover("_d", d, CommitMode.Rename)
    assert(new java.io.File(s"$dir/_d").isFile)
    assert(BatchedState.readPointer(spark, d) === Some("old-value"))

    // crash point E: stage TORN, pointer intact (crash mid-staging).
    // Readers never consult a torn stage while the pointer resolves;
    // re-run re-stages from the pointer.
    val e = freshPtr("_e")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/._e.migrate"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/._e.migrate/manifest-${"%020d".format(0L)}"),
      "G2|40|0|old".getBytes("UTF-8"))
    plantLock("_e")
    assert(BatchedState.readPointer(spark, e) === Some("old-value"))
    recover("_e", e, CommitMode.Manifest)
    assert(BatchedState.readPointer(spark, e) === Some("old-value"))
  }

  test("an orphaned stage without its lock is INERT — absent reads absent, torn throws, deletes stay deleted") {
    // review wave r17: a crashed migration whose stale lock an
    // operator removed (without re-running the verb) must not leave a
    // stage that shadows the pointer's later life — months on, a torn
    // copy rescued by a stale value would be a silent rewind, and a
    // decertify-style delete would be resurrected.
    val dir = tmp("orphan")
    val hfs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(s"$dir/_wm")
    val stage = new Path(s"$dir/._wm.migrate")
    hfs.mkdirs(stage): Unit
    BatchedState.createManifest(spark, stage, 0L, "stale-value")

    // absent pointer + orphaned stage (no lock): unpublished, not stale
    assert(BatchedState.readPointer(spark, p) === None,
      "an orphaned stage must not masquerade as a committed pointer")

    // torn pointer + orphaned stage: the torn refusal stays loud
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_wm"),
      "G2|40|deadbeef|trunc".getBytes("UTF-8"))
    intercept[IllegalStateException] {
      BatchedState.readPointer(spark, p)
    }
    hfs.delete(p, false): Unit

    // deletePointer removes the stage with the pointer — decertify
    // cannot be resurrected even WITH a live lock standing
    BatchedState.writePointer(spark, p, "live")
    hfs.create(new Path(s"$dir/._wm.migrate_lock"), true).close()
    hfs.delete(stage, true): Unit // fresh stage for this scenario
    hfs.mkdirs(stage): Unit
    BatchedState.createManifest(spark, stage, 0L, "live")
    BatchedState.deletePointer(spark, p)
    assert(BatchedState.readPointer(spark, p) === None,
      "deletePointer must take the migration stage with it")
  }

  test("refusals: unpublished pointer, torn-without-stage, concurrent migration, root pointer") {
    val dir = tmp("refuse")
    val hfs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // an unpublished pointer has nothing to migrate
    val none = intercept[IllegalStateException] {
      BatchedState.migratePointer(spark, new Path(s"$dir/_never"),
        CommitMode.Manifest)
    }
    assert(none.getMessage.contains("nothing to migrate"), none.getMessage)

    // a torn pointer with no stage cannot be migrated — its owner must
    // re-publish first (the verb must not guess a value)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_torn"),
      "G2|40|deadbeef|trunc".getBytes("UTF-8"))
    val torn = intercept[IllegalStateException] {
      BatchedState.migratePointer(spark, new Path(s"$dir/_torn"),
        CommitMode.Manifest)
    }
    assert(torn.getMessage.contains("torn pointer without a stage"),
      torn.getMessage)

    // a held migrate lock excludes a second migration, loudly
    val p = new Path(s"$dir/_locked")
    BatchedState.writePointer(spark, p, "v")
    hfs.create(new Path(s"$dir/._locked.migrate_lock"), true).close()
    val locked = intercept[IllegalStateException] {
      BatchedState.migratePointer(spark, p, CommitMode.Manifest)
    }
    assert(locked.getMessage.contains("pointer migration"), locked.getMessage)
    // the refusal left the pointer untouched and readable
    assert(BatchedState.readPointer(spark, p) === Some("v"))
  }
}
