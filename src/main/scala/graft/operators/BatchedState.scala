package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** How a pointer COMMITS — the seam between rename-capable filesystems
  * and object stores (r15 verdict item 1, promoted from the standing
  * "not S3A-safe" documentation to a real protocol choice):
  *
  *  - [[CommitMode.Rename]] (default): temp + [[BatchedState.atomicReplace]].
  *    Atomic on local (NIO rename(2)) and HDFS (FileContext OVERWRITE);
  *    the right mode everywhere rename is a metadata operation.
  *  - [[CommitMode.Manifest]]: the pointer is a DIRECTORY of
  *    `manifest-<n>` files, each written CREATE-NEW with the full
  *    checksummed payload — no rename, no delete-then-create, no
  *    overwrite anywhere on the commit path, so there is nothing a
  *    copy+delete "rename" can tear and no window where the pointer
  *    does not exist. Readers resolve the highest COMPLETE manifest
  *    (checksum-verified); an interrupted writer leaves at worst a
  *    torn max-n file that readers skip — the previous commit stays
  *    served, a pointer is never lost. This is the Delta-log form of
  *    commit (monotone numbered files, readers take the max complete
  *    one) reduced to single-payload pointers, for deployments where
  *    the table-format jars are unavailable.
  *
  * Readers need no mode: [[BatchedState.readPointer]] auto-detects
  * (file → rename-mode content, directory → manifest resolution), so
  * every existing read site serves both. A pointer path keeps ONE mode
  * for its lifetime — switching modes in place would need exactly the
  * delete+recreate this mode exists to avoid.
  *
  * Writer uniqueness rides the same single-writer discipline as rename
  * mode (the repo's create-new locks / external coordination on object
  * stores); the monotone create-new is a second line of defense that
  * turns an undetected writer race into a loud create failure instead
  * of a silent overwrite. */
sealed trait CommitMode
object CommitMode {
  case object Rename extends CommitMode
  case object Manifest extends CommitMode
  /** Resolve from the session at write time
    * (`spark.graft.commit.mode` = `rename` (default) | `manifest`) —
    * the writePointer default, so ONE deployment knob flips every
    * [[BatchedState.writePointer]] site (watermarks+tallies, the
    * online `_latest` generation head, the `_pending_commit` /
    * `_rebuild_pending` markers, `_mart_meta.json`, the file-stats
    * index head) to the object-store-safe protocol without per-call
    * plumbing; an explicit per-call mode still wins. Since r17 the
    * four write-once artifact manifests ride the same protocol
    * (IvfIndex `_meta`, TokenizerArtifact/ModelStore `_meta`,
    * CurationRun's run manifest, `_online_meta.json` — each formerly
    * a direct [[BatchedState.atomicReplace]] swap), so the knob flips
    * EVERY pointer site in the repo; their readers resolve through
    * [[BatchedState.readPointer]], legacy bare files passing through
    * unmigrated. Flipping the conf over an EXISTING rename-mode
    * deployment refuses loudly — at the protocol entries BEFORE any
    * heavy work ([[BatchedState.assertPointerWritable]]), and at the
    * write itself as the last line (both directions of the
    * one-mode-per-pointer guard) — migrate by publishing under fresh
    * paths or with [[BatchedState.migratePointer]]. */
  case object Session extends CommitMode
}

/** What an id-watermarked dedup refresh did — the G44 late-arrival
  * audit carried onto the ID axis ([[IncrementalDedup]],
  * [[IncrementalEmbedDedup]]; r15 verdict item 2: these two high-water
  * consumers still shed below-mark arrivals silently).
  *
  *  - `fresh`: rows above the watermark this refresh incorporated;
  *  - `lateRows`: cumulative count of input rows at/below the id
  *    watermark never incorporated — the rows the high-water design
  *    sheds, measured. EXACT when the input is the full corpus (both
  *    operators' audited contract); a delta-fed refresh under-reports
  *    (clamped at 0) and the next full-corpus refresh reads exactly
  *    again. −1 when `audit = false`.
  *
  * No `replayShedRows` twin here: these operators have no
  * per-partition guard to shed replays — a crash retry re-derives its
  * watermark-tagged batch and OVERWRITES the orphan (the committed-
  * batch protocol), so replays cost recompute, never a count. */
final case class DedupRefreshResult(fresh: Long, lateRows: Long)

/** The committed-batch-directory protocol shared by the incremental
  * operators ([[IncrementalDedup]], [[IncrementalEmbedDedup]]): state
  * accumulates as `dir/batch=<tag>` parquet directories, each tagged by
  * the watermark its writing refresh EXTENDED, and a batch is committed
  * only once the shared `_watermark` file (graft.registry.Incremental)
  * has advanced past its tag. A refresh that crashes after writing its
  * directory but before the watermark swap leaves state no reader or
  * retry can see; the retry re-derives the batch and overwrites the
  * orphan. Idempotent without an ACID table format (Delta/Iceberg are
  * environment-blocked; this is the same adjudicated substitute as the
  * FeatureStore manifest). */
private[graft] object BatchedState {

  def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tagOf(wm: Long): String =
    if (wm == Long.MinValue) "init" else wm.toString

  /** None for a directory whose `batch=` tag is neither `init` nor a
    * long — a stray/foreign dir must be skipped, not crash every read. */
  def tagValue(t: String): Option[Long] =
    if (t == "init") Some(Long.MinValue) else scala.util.Try(t.toLong).toOption

  /** (tag value, path) of every batch directory under `dir` whose tag is
    * strictly below the current watermark — i.e. whose writing refresh
    * went on to advance the watermark past it. The at-most-one
    * uncommitted directory (tag == current watermark) is excluded, which
    * is the crash-retry guarantee: a retry sees exactly the state the
    * failed attempt saw. */
  def committedBatches(spark: SparkSession, dir: String,
      wm: Long): Seq[(Long, String)] = {
    val p = new Path(dir)
    val hfs = fs(spark, dir)
    if (!hfs.exists(p)) Seq.empty
    else hfs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .flatMap(s => tagValue(s.getPath.getName.stripPrefix("batch="))
        .map(v => (v, s.getPath.toString)))
      .filter(_._1 < wm)
  }

  def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Atomic create-new writer lock — THE multi-writer convention of this
    * repo, shared by the FeatureStore per-version lock, [[IvfIndex]]'s
    * add/compact lock, and the incremental refreshes ([[IncrementalDedup]],
    * [[IncrementalEmbedDedup]]): an empty marker file created with
    * overwrite=false, so exactly one concurrent writer can create it and
    * the loser fails cleanly BEFORE writing any data. On the local scheme
    * Hadoop's create(overwrite=false) is check-then-create, so NIO's
    * atomic CREATE_NEW is used there. Mutual exclusion is guaranteed only
    * on filesystems with an atomic exclusive create (local via NIO,
    * HDFS); on S3A and most object stores create(path, overwrite=false)
    * is itself check-then-write (existence visible only at close), so
    * two racing writers can both "win" — there, serialize writers with an
    * external coordinator (scheduler, queue, or conditional-put lock)
    * instead of relying on this marker. A hard-crashed writer leaves a
    * stale lock an operator removes — fail-safe, never lost data. */
  def tryAcquireLock(spark: SparkSession, lock: Path): Boolean = {
    val hfs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if ("file" == lock.toUri.getScheme || hfs.getScheme == "file") {
      val p = java.nio.file.Paths.get(lock.toUri.getPath)
      try {
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.createFile(p); true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { hfs.create(lock, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  }

  /** [[tryAcquireLock]] that fails loudly naming the holder semantics:
    * the loser of a writer race stops here having written nothing. */
  def acquireLock(spark: SparkSession, lock: Path, what: String): Unit =
    if (!tryAcquireLock(spark, lock)) throw new IllegalStateException(
      s"concurrent $what writer holds $lock — retry after it commits " +
        "(or remove the stale lock a hard-crashed writer left)")

  def releaseLock(spark: SparkSession, lock: Path): Unit =
    lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(lock, false)

  /** Atomically replace `dst` with `tmp` — THE pointer/watermark swap
    * primitive (generation pointers, watermarks, manifest heads). A
    * reader must observe either the old or the new content, never a
    * missing file. FileContext.rename(OVERWRITE) is natively atomic on
    * HDFS, but on the LOCAL scheme Hadoop's default renameInternal is
    * check-delete-then-rename — a concurrent reader polling between the
    * delete and the rename finds NO file (caught live by
    * StreamingOnlineRefreshSpec's mid-stream poller). On local, NIO's
    * ATOMIC_MOVE maps to rename(2), which replaces in one syscall —
    * the same scheme dispatch as [[tryAcquireLock]]. On object stores
    * rename is copy+delete and nothing here is atomic; there, pointer
    * state belongs in a conditional-put object or a table format. */
  def atomicReplace(spark: SparkSession, tmp: Path, dst: Path): Unit = {
    val hfs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if ("file" == dst.toUri.getScheme || hfs.getScheme == "file") {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      // Hadoop's LocalFileSystem keeps a `.name.crc` checksum sidecar
      // per file, and moving the data file alone strands the OLD crc
      // beside the NEW content — every later Hadoop read then dies
      // with ChecksumException (hit live by the r14 50× sweep on a
      // bm25 index written pre-fix and swapped post-fix). Sequence so
      // a concurrent reader NEVER sees data+crc mismatch: drop the
      // stale dst crc (crc-less reads are legal and unverified), swap
      // the data atomically, then install the tmp's crc under the dst
      // name. A crash anywhere in between leaves at worst a missing
      // crc — always readable.
      // root-level pointers have no parent dir: a null getParent must
      // read as "no crc sidecar", not NPE inside the swap primitive
      def crcOf(p: Path): Option[java.nio.file.Path] =
        Option(p.getParent).map(par =>
          Paths.get(new Path(par, s".${p.getName}.crc").toUri.getPath))
      crcOf(dst).foreach(c => Files.deleteIfExists(c): Unit)
      try Files.move(
        Paths.get(tmp.toUri.getPath),
        Paths.get(dst.toUri.getPath),
        StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING): Unit
      catch {
        // NIO leaves ATOMIC_MOVE+REPLACE_EXISTING onto an existing
        // target implementation-specific: rename(2) semantics on
        // POSIX (replace in one syscall — the case this primitive
        // exists for), but some platforms/filesystems throw instead.
        // There, degrade to the delete window rather than hard-fail
        // the swap: a reader can transiently miss the file (the
        // pre-r14 behavior), which callers survive; a refused swap
        // would wedge every publish.
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(
            Paths.get(tmp.toUri.getPath),
            Paths.get(dst.toUri.getPath),
            StandardCopyOption.REPLACE_EXISTING): Unit
      }
      for (ct <- crcOf(tmp) if Files.exists(ct); cd <- crcOf(dst))
        Files.move(ct, cd, StandardCopyOption.REPLACE_EXISTING): Unit
    } else {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        dst.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(fc.makeQualified(tmp), fc.makeQualified(dst),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Torn-write DETECTION for single-line pointer files (watermarks,
    * generation pointers, index heads). [[atomicReplace]] makes the
    * swap atomic on local/HDFS, but on object stores rename is
    * copy+delete and a crash can leave a PREFIX of the intended
    * content — which a bare-payload reader happily parses: a watermark
    * "1754900000000" torn to "17549" silently REWINDS the mark and the
    * next refresh double-derives five years of history. The v2 format
    * embeds length + CRC32 so a reader refuses a torn pointer loudly
    * instead: `G2|<payload-length>|<crc32-hex>|<payload>`.
    *
    * Back-compatible by construction: a file NOT starting with `G2|`
    * parses as the legacy bare payload (trimmed), so pre-upgrade
    * pointers read without migration. Legal payloads (longs, `gen=N`,
    * directory names) never start with `G2|` themselves. */
  def encodePointer(payload: String): String = {
    val crc = new java.util.zip.CRC32()
    crc.update(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    s"G2|${payload.length}|${java.lang.Long.toHexString(crc.getValue)}|$payload"
  }

  /** Inverse of [[encodePointer]]; `where` names the file in the
    * refusal. A legacy bare payload passes through trimmed. */
  def decodePointer(content: String, where: => String): String =
    if (!content.startsWith("G2|")) content.trim
    else {
      def torn(why: String) = throw new IllegalStateException(
        s"torn or corrupt pointer file at $where ($why): " +
          s"'${content.take(120)}' — an interrupted copy-style rename " +
          "(object stores) can truncate pointer content; restore the " +
          "file from the writer's last completed publish (or re-run " +
          "the refresh/publish that owns it) before reading")
      // the payload may itself contain '|': split on the first three
      // separators only, then verify length + checksum over the rest
      val body = content.drop(3)
      val i = body.indexOf('|')
      val j = if (i < 0) -1 else body.indexOf('|', i + 1)
      if (j < 0) torn("missing header fields")
      val payload = body.substring(j + 1)
      val lenOk = body.substring(0, i).toIntOption.contains(payload.length)
      if (!lenOk) torn("length mismatch")
      val crc = new java.util.zip.CRC32()
      crc.update(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (java.lang.Long.toHexString(crc.getValue) != body.substring(i + 1, j))
        torn("checksum mismatch")
      payload
    }

  /** Write `payload` to `dst` in the checksummed v2 format — THE
    * pointer write. [[CommitMode.Rename]] (default): temp +
    * [[atomicReplace]]. [[CommitMode.Manifest]]: a new numbered
    * manifest file under the `dst` directory, create-new only (see
    * [[CommitMode]]). */
  def writePointer(spark: SparkSession, dst: Path, payload: String,
      mode: CommitMode = CommitMode.Session): Unit = mode match {
    case CommitMode.Session =>
      writePointer(spark, dst, payload, resolveSessionMode(spark))
    case CommitMode.Rename =>
      val hfs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // symmetric mode-mixing guard (review wave 2, r16): without it a
      // rename write onto a manifest DIRECTORY surfaced as a raw FS
      // error at best — and FileContext.rename(OVERWRITE) onto an
      // EMPTY manifest dir (a crashed first commit) would SUCCEED,
      // silently flipping the pointer's mode
      if (hfs.exists(dst) && hfs.getFileStatus(dst).isDirectory)
        throw new IllegalStateException(
          s"$dst is a manifest-mode pointer DIRECTORY — a pointer path " +
            "keeps one commit mode for its lifetime; restore " +
            "spark.graft.commit.mode=manifest (or pass mode = Manifest) " +
            "for this deployment, or publish rename-mode state under a " +
            "fresh path")
      val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
      val out = hfs.create(tmp, true)
      try out.write(encodePointer(payload)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      atomicReplace(spark, tmp, dst)
    case CommitMode.Manifest =>
      val hfs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (hfs.exists(dst) && !hfs.getFileStatus(dst).isDirectory)
        throw new IllegalStateException(
          s"$dst is a rename-mode pointer FILE — a pointer path keeps one " +
            "commit mode for its lifetime (migrating needs the " +
            "delete+recreate manifest mode exists to avoid); publish " +
            "manifest-mode state under a fresh path")
      hfs.mkdirs(dst): Unit
      val next = manifestEntries(hfs, dst).headOption.fold(0L)(_._1 + 1L)
      createManifest(spark, dst, next, payload)
      // best-effort prune: manifests superseded KeepManifests commits
      // ago (the in-flight-reader window argument of
      // pruneOnlineGenerations); a failed delete costs listing time,
      // never correctness
      manifestEntries(hfs, dst).drop(KeepManifests)
        .foreach(e => try hfs.delete(e._2, false): Unit
          catch { case _: Exception => () })
  }

  /** The session's resolved commit mode (`spark.graft.commit.mode`,
    * default rename) — what [[CommitMode.Session]] writes under. */
  private[graft] def resolveSessionMode(spark: SparkSession): CommitMode =
    spark.conf.getOption("spark.graft.commit.mode")
      .getOrElse("rename") match {
      case "rename" => CommitMode.Rename
      case "manifest" => CommitMode.Manifest
      case other => throw new IllegalArgumentException(
        s"spark.graft.commit.mode='$other' — expected rename|manifest")
    }

  /** Fail BEFORE heavy work when the pointer at `ptr` cannot be
    * written under the session's resolved mode (review wave 2, r16):
    * the incremental protocols overwrite data partitions first and
    * advance their watermark LAST, so without this probe a mode
    * mismatch surfaced only after the overwrite — a crash-equivalent,
    * retryable state, but "refuses at the first write" was overclaimed
    * and every retry re-paid the overwrite. Callers probe their
    * watermark path up front; the write-time guards stay as the last
    * line of defense. `mode` is the commit mode the eventual write
    * will use — the Session default resolves the knob; an explicit
    * per-call mode (publishOnlineGeneration's parameter) probes THAT
    * mode, so the probe can never pass a write that would refuse
    * (ADVICE r16: the generation publish gained the mode parameter
    * but not the probe, so a mismatch surfaced only at the `_latest`
    * write — after the full bucketed generation was written — and
    * every retry re-paid the publish and stranded an orphan `gen=<n>`
    * directory pruneOnlineGenerations never reclaims). */
  private[graft] def assertPointerWritable(spark: SparkSession,
      ptr: Path, mode: CommitMode = CommitMode.Session): Unit = {
    val hfs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (hfs.exists(ptr)) {
      val isDir = hfs.getFileStatus(ptr).isDirectory
      (mode match {
        case CommitMode.Session => resolveSessionMode(spark)
        case m => m
      }) match {
        case CommitMode.Manifest if !isDir => throw new IllegalStateException(
          s"$ptr is a rename-mode pointer FILE and " +
            "spark.graft.commit.mode=manifest — a pointer path keeps one " +
            "commit mode for its lifetime; unset the knob for this " +
            "deployment or publish manifest-mode state under a fresh path")
        case CommitMode.Rename if isDir => throw new IllegalStateException(
          s"$ptr is a manifest-mode pointer DIRECTORY and the session " +
            "resolves rename mode — restore spark.graft.commit.mode=" +
            "manifest for this deployment or publish rename-mode state " +
            "under a fresh path")
        case _ => ()
      }
    }
  }

  /** Manifests kept per pointer in [[CommitMode.Manifest]]: the newest
    * this many survive the write-side prune, bounding both listing
    * cost and the window an in-flight reader has between listing and
    * reading (8 commits, same order as the generation keep windows). */
  val KeepManifests = 8

  private def manifestName(n: Long): String = f"manifest-$n%020d"

  /** `manifest-<n>` entries under `dir`, NEWEST FIRST. Foreign names
    * are skipped, not fatal (the committedBatches convention). */
  private def manifestEntries(hfs: FileSystem,
      dir: Path): Seq[(Long, Path)] =
    (Option(hfs.globStatus(new Path(dir, "manifest-*")))
      .getOrElse(Array.empty).toSeq
      .flatMap(s => s.getPath.getName.stripPrefix("manifest-")
        .toLongOption.map(n => (n, s.getPath))))
      .sortBy(-_._1)

  /** Create manifest `n` under `dir`, create-new: two writers racing
    * to the same number fail loudly instead of silently overwriting
    * (the lock convention's second line of defense). Local scheme uses
    * NIO CREATE_NEW — Hadoop's local create(overwrite=false) is
    * check-then-create, the same gap [[tryAcquireLock]] closes. */
  private[graft] def createManifest(spark: SparkSession, dir: Path,
      n: Long, payload: String): Unit = {
    val f = new Path(dir, manifestName(n))
    val hfs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = encodePointer(payload)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def lost(e: Throwable) = throw new IllegalStateException(
      s"manifest $f already exists — a concurrent writer committed this " +
        "number first; serialize writers (the pointer's lock) and retry " +
        "to commit on top of its value", e)
    if ("file" == f.toUri.getScheme || hfs.getScheme == "file") {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      try Files.write(Paths.get(f.toUri.getPath), bytes,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE): Unit
      catch { case e: java.nio.file.FileAlreadyExistsException => lost(e) }
    } else {
      val out = try hfs.create(f, false)
      catch { case e: java.io.IOException => lost(e) }
      try out.write(bytes) finally out.close()
    }
  }

  /** Resolve a manifest-mode pointer directory: the highest COMPLETE
    * manifest's payload. A torn manifest (an interrupted writer's
    * partial upload) is SKIPPED — its commit never happened, the
    * previous one is the pointer's value. A directory with manifests
    * but NO complete one reads as None, not an error (review wave
    * r16): it is exactly a crashed FIRST commit, and rename mode's
    * twin — tmp written, dst never swapped — also reads as
    * unpublished; throwing "restore from the last completed publish"
    * there prescribed an impossible remediation. The last complete
    * manifest can never be pruned out from under this (prune keeps the
    * newest KeepManifests entries and the just-written complete commit
    * is always the max), so None genuinely means no commit ever
    * completed — or external damage, the same exposure rename mode has
    * to a deleted pointer file. A manifest deleted between our listing
    * and our open (the writer's prune racing a reader holding a stale
    * listing) re-lists and retries, bounded. */
  private def readManifestDir(hfs: FileSystem, dir: Path): Option[String] = {
    var attempts = 0
    while (attempts < 3) {
      attempts += 1
      val entries = manifestEntries(hfs, dir).iterator
      var vanished = false
      while (!vanished && entries.hasNext) {
        val (_, p) = entries.next()
        val txt =
          try {
            val in = hfs.open(p)
            try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
            finally in.close()
          } catch {
            // pruned between list and open: the whole LISTING is stale
            // evidence — stop here and re-list rather than fall through
            // to an older entry (review wave 2: a stuck old manifest
            // surviving past its window could otherwise be returned as
            // the value while newer complete commits exist)
            case _: java.io.FileNotFoundException => vanished = true; None
          }
        // manifest files are ALWAYS G2-encoded by the writer: bare
        // content is a torn prefix or foreign junk (skip — an
        // in-flight commit, not pruning evidence), never legacy
        txt.filter(_.startsWith("G2|")).foreach { t =>
          try return Some(decodePointer(t, p.toString))
          catch { case _: IllegalStateException => () }
        }
      }
      if (!vanished) return None
    }
    throw new IllegalStateException(
      s"manifest listing under $dir went stale 3 times (entries pruned " +
        "between list and read) — the writer is committing faster than a " +
        s"single pointer read; raise KeepManifests ($KeepManifests)")
  }

  /** Read + validate a pointer; None when absent. Mode is
    * AUTO-DETECTED: a directory resolves as a manifest-mode pointer
    * ([[readManifestDir]]); a file as rename-mode content — torn v2
    * content refuses loudly ([[decodePointer]]), legacy bare content
    * passes through. One extension (r17, [[migratePointer]]): when the
    * pointer does not resolve — absent, no complete manifest, or torn
    * — and a COMPLETE migration stage (`.<name>.migrate`) sits beside
    * it UNDER A LIVE MIGRATE LOCK, the staged value is served: the
    * lock+stage pair exists exactly from staging until the migration
    * commits (or hard-crashes — where the pointer is writer-quiesced
    * by the verb's contract, so the staged value IS current), and the
    * lock gate keeps an ORPHANED stage from ever overriding
    * absent/torn semantics after the pointer has legitimately moved on
    * (review wave r17: an abandoned stage would otherwise resurrect a
    * stale value under a later torn copy, and defeat decertify-style
    * pointer deletes — which [[deletePointer]] also hardens). A stage
    * MISS after the pointer failed to resolve re-probes the pointer
    * once: the migration commits monotonically (new pointer built
    * before the stage is dropped), so a reader racing the completion
    * finds the new value instead of misreporting "unpublished". The
    * fallback costs existence probes only on paths already failing. */
  def readPointer(spark: SparkSession, src: Path): Option[String] = {
    val hfs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // (migration-aware): returns the staged value when a migration is
    // provably in flight (lock present), and otherwise ONE raw
    // re-probe of the pointer — because a failed first resolve can
    // also mean the pointer CHANGED SHAPE under our feet: a
    // migratePointer that COMPLETED between our stat and our
    // open/list (file→directory or directory→file, lock already
    // released) leaves the new-mode pointer fully readable, yet the
    // first pass surfaces it as FileNotFound (file became a
    // directory) or as an empty manifest listing resolving None
    // (directory became a file mid-readManifestDir). Both were found
    // BY CONSTRUCTION by the r18 vanish-step enumeration
    // (OnlineReadRaceEnumSpec — race shapes four and five, after
    // three rounds of timing-luck finds); returning None would
    // misreport a published pointer as "unpublished" to every caller.
    // A pointer genuinely deleted (deletePointer/decertify) re-probes
    // to None — the absent-now semantics this path always had — and
    // the probe costs one stat on a path that already failed.
    def fallback(): Option[String] = {
      if (src.getParent == null) return None
      if (!hfs.exists(migrateLockPath(src)))
        return try readPointerRaw(spark, hfs, src)
        catch {
          case _: java.io.FileNotFoundException => None // really gone
          case _: IllegalStateException => None // torn now; caller rethrows original
        }
      val stagedVal =
        try {
          val st = migrateStagePath(src)
          if (hfs.exists(st)) readPointerRaw(spark, hfs, st) else None
        } catch {
          case _: IllegalStateException => None // torn stage
          case _: java.io.FileNotFoundException => None // vanished mid-read
        }
      stagedVal.orElse(readPointerRaw(spark, hfs, src))
    }
    try readPointerRaw(spark, hfs, src).orElse(fallback())
    catch {
      // deleted between the exists probe and the open (a reader racing
      // migratePointer's swap or deletePointer): absent-now semantics —
      // the fallback serves a mid-migration stage, a completed
      // migration's new-mode pointer re-probes clean, a plain delete
      // resolves None (review wave 2, r17; shape-change re-probe r18)
      case _: java.io.FileNotFoundException => fallback()
      case e: IllegalStateException =>
        val st = fallback()
        if (st.isDefined) st else throw e // torn pointer, no staged rescue
    }
  }

  /** Delete a pointer AND any migration stage beside it — the
    * decertify/wipe primitive (review wave r17): a bare delete of the
    * pointer file leaves a crashed migration's stage standing, and
    * the reader fallback would resurrect the deleted value while the
    * stale migrate lock survives. Never touches the migrate lock
    * itself (an operator owns stale-lock removal). */
  private[graft] def deletePointer(spark: SparkSession, ptr: Path): Unit = {
    val hfs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // stage FIRST (review wave 2, r17): a crash between the two deletes
    // must leave the pointer still present (decertify incomplete but
    // value intact — re-run finishes), never a deleted pointer whose
    // stage a stale migrate lock could resurrect
    if (ptr.getParent != null) hfs.delete(migrateStagePath(ptr), true): Unit
    hfs.delete(ptr, true): Unit
  }

  /** [[readPointer]] without the migration-stage fallback — the
    * migration verb itself must see each location as it is. */
  private def readPointerRaw(spark: SparkSession, hfs: FileSystem,
      src: Path): Option[String] = {
    if (!hfs.exists(src)) None
    else if (hfs.getFileStatus(src).isDirectory) readManifestDir(hfs, src)
    else {
      val in = hfs.open(src)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      // an interrupted NON-atomic pointer write (migratePointer's
      // in-place build is the one writer that creates a reader-visible
      // file non-atomically) can leave "", "G" or "G2" — prefixes of
      // the v2 header that the legacy passthrough would happily serve
      // as a (wrong) bare payload; every longer prefix already refuses
      // inside decodePointer. No legal payload is blank or a strict
      // header prefix, so refuse these loudly too (review wave 2, r17)
      if (txt.trim.isEmpty || txt == "G" || txt == "G2")
        throw new IllegalStateException(
          s"torn or corrupt pointer file at $src (empty or header " +
            "prefix) — an interrupted write left no complete payload; " +
            "re-run the migration or publish that owns it")
      Some(decodePointer(txt, src.toString))
    }
  }

  // ---- pointer mode migration (r17 directive 3) -----------------------------

  private[graft] def migrateStagePath(ptr: Path): Path =
    new Path(ptr.getParent, s".${ptr.getName}.migrate")

  private def migrateLockPath(ptr: Path): Path =
    new Path(ptr.getParent, s".${ptr.getName}.migrate_lock")

  /** Migrate a pointer path between commit modes IN PLACE — the verb a
    * deployment flipping `spark.graft.commit.mode` over years of
    * existing state needs (the alternative the mode-mixing guards
    * prescribe, re-publishing every state under fresh paths, re-pays
    * entire publishes for a metadata change). `to` is the target mode
    * (Session resolves the knob); already-in-target-mode is an
    * idempotent no-op.
    *
    * Protocol — stage-and-verify with a sentinel readers honor, ZERO
    * renames of its own (spec counter-asserted through the
    * copy+delete shim):
    *
    *  1. stage the pointer's committed value at `.<name>.migrate` in
    *     the TARGET mode and verify it reads back byte-exactly;
    *  2. delete the old-mode pointer (a file and a directory cannot
    *     share a path — the unavoidable step this verb exists to
    *     sequence safely);
    *  3. build the new-mode pointer in place (create-new manifest-0,
    *     or a create-new checksummed file — no rename either way),
    *     verify it resolves, then remove the stage.
    *
    * Crash analysis, pinned by MigratePointerSpec at every point: a
    * crash before (2) leaves the old pointer authoritative (readers
    * unaffected; re-run re-stages); a crash inside the (2)→(3) window
    * leaves the pointer absent/incomplete/torn — exactly the states
    * [[readPointer]]'s stage fallback rescues, so readers still
    * resolve the OLD value; re-running the verb completes the build
    * from the verified stage. At no crash point does a reader observe
    * "unpublished" or a wrong value, and the payload is preserved
    * byte-exactly.
    *
    * Single-writer contract: run while the pointer's OWNING writer is
    * quiesced (the same discipline any offline migration needs).
    * Concurrent migrations exclude each other on a create-new lock
    * (`.<name>.migrate_lock`). A hard-crashed run leaves the lock AND
    * the stage standing — remove the stale lock and RE-RUN the verb as
    * one recovery action (it completes or re-stages); the reader
    * fallback is deliberately lock-GATED, so removing the lock alone
    * renders an orphaned stage inert rather than letting it shadow the
    * pointer's later life (review wave r17). A writer that races the
    * verb anyway fails loudly, never silently: the in-place build is
    * create-new, and a writer re-creating the pointer mid-window
    * collides with it. */
  def migratePointer(spark: SparkSession, ptr: Path,
      to: CommitMode): Unit = {
    require(ptr.getParent != null,
      s"cannot migrate a filesystem-root pointer: $ptr")
    val target = to match {
      case CommitMode.Session => resolveSessionMode(spark)
      case m => m
    }
    val hfs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    acquireLock(spark, migrateLockPath(ptr), "pointer migration")
    // once the old pointer is deleted, the stage is the only committed
    // copy and the reader fallback is gated on THIS lock — so a SOFT
    // failure (exception, not a hard crash) inside the swap window must
    // leave the lock standing, exactly like a hard crash, or the
    // staged value goes dark (review wave 2, r17)
    var inSwapWindow = false
    try {
      val stage = migrateStagePath(ptr)
      def resolveTolerant(p: Path): Option[String] =
        try readPointerRaw(spark, hfs, p)
        catch { case _: IllegalStateException => None } // torn = no value
      val targetIsDir = target == CommitMode.Manifest
      val ptrValue =
        if (!hfs.exists(ptr)) None
        else if (hfs.getFileStatus(ptr).isDirectory == targetIsDir) {
          // already target mode. Complete = done (drop any stale
          // stage); incomplete (a crash between the old-pointer delete
          // and the in-place build's commit) = fall through and finish
          // from the stage.
          resolveTolerant(ptr) match {
            case Some(_) => hfs.delete(stage, true): Unit; return
            case None => None
          }
        } else resolveTolerant(ptr)

      val payload = ptrValue match {
        case Some(v) =>
          // fresh (or restarted-before-delete) migration: (re)stage the
          // authoritative value in the target mode, verified
          hfs.delete(stage, true): Unit
          stageValue(spark, hfs, stage, v, targetIsDir)
          v
        case None =>
          // resuming inside the swap window: the verified stage is the
          // only complete copy — require it, refuse loudly otherwise
          resolveTolerant(stage).getOrElse(throw new IllegalStateException(
            s"nothing to migrate at $ptr: the pointer holds no committed " +
              "value and no complete migration stage exists — an " +
              "unpublished pointer needs no migration (publish in the " +
              "target mode instead); a torn pointer without a stage " +
              "needs its owner's re-publish first"))
      }
      // the swap: remove whatever old-mode remnant occupies the path,
      // then build the target mode IN PLACE — create-new only. The
      // window opens BEFORE the delete (review wave 3, r17): the
      // delete itself can fail partway (a recursive dir delete losing
      // only the newest manifest), and releasing the lock there would
      // both hide the stage from readers and let a re-run re-stage a
      // silently rolled-back older value; the stage is verified
      // complete by this point in every path, so holding the lock is
      // always the right failure posture from here on
      inSwapWindow = true
      hfs.delete(ptr, true): Unit
      if (targetIsDir) {
        hfs.mkdirs(ptr): Unit
        createManifest(spark, ptr, 0L, payload)
      } else {
        val out = hfs.create(ptr, false) // create-new: racing writers collide loudly
        try out.write(encodePointer(payload)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      require(readPointerRaw(spark, hfs, ptr).contains(payload),
        s"migrated pointer at $ptr failed readback verification")
      hfs.delete(stage, true): Unit
      inSwapWindow = false
    } catch {
      case e: Throwable if inSwapWindow => throw new IllegalStateException(
        s"pointer migration at $ptr failed inside the swap window — the " +
          "migrate lock is left standing DELIBERATELY so readers keep " +
          "resolving the staged value; remove the stale lock and re-run " +
          "migratePointer as one recovery action to complete it", e)
    } finally {
      if (!inSwapWindow) releaseLock(spark, migrateLockPath(ptr))
    }
  }

  /** Every pointer-site NAME in the repo — the discovery set behind
    * [[migrateAll]]. One entry per writePointer call-site class:
    * `_watermark` (Incremental marks + tallies — value snapshots,
    * marts, dedup state), `_latest` (online generation head),
    * `_online_meta.json` (per-generation bucket meta),
    * `_mart_meta.json` (SupplyMart layout), `_pending_commit` /
    * `_rebuild_pending` (crash markers), `_gen` (value-store partition
    * generation), `_meta` (IvfIndex + ModelStore/TokenizerArtifact +
    * CurationRun stage markers), `manifest.json` (CurationRun's run
    * manifest), `_stats_index_ptr` (file-stats index head), and
    * `_catalog` (the definition catalog, r18). A NEW writePointer
    * call site must add its name here or a whole-store migration
    * silently skips it — MigrateAllSpec cross-checks this set against
    * the main-source writePointer sites. */
  private[graft] val PointerSiteNames: Set[String] = Set(
    "_watermark", "_latest", "_online_meta.json", "_mart_meta.json",
    "_pending_commit", "_rebuild_pending", "_gen", "_meta",
    "manifest.json", "_stats_index_ptr", "_catalog")

  /** The whole-store knob flip (r18 directive 5): discover every
    * pointer site under `root` by name ([[PointerSiteNames]]) and
    * apply [[migratePointer]] to each — one verb where a deployment
    * flipping `spark.graft.commit.mode` over a populated store
    * previously had ≥11 site classes to enumerate by hand. Returns
    * the migrated site paths (sorted).
    *
    * Semantics, all inherited from the per-pointer verb: idempotent
    * (already-in-target-mode sites are no-ops, so a crash mid-sweep
    * re-runs to completion); readers never observe "unpublished" at
    * any crash point (the staged-sentinel protocol); a torn site with
    * no committed value refuses loudly naming it (its owner must
    * re-publish first — migrating corruption forward would bless it).
    *
    * Discovery is name-based and conservative: dot-prefixed entries
    * (stages, locks, temp files) are skipped, and the walk does not
    * descend INTO a discovered site (a manifest-mode pointer is a
    * directory whose children are commit files, not sites). ONE
    * dot-entry class IS evidence of a site: `.<name>.migrate` /
    * `.<name>.migrate_lock` remnants of a crashed migration whose
    * live pointer sits deleted inside the swap window — there is no
    * `<name>` entry to discover, and skipping it would leave the site
    * stuck on its stage forever while the sweep reports success
    * (found by MigrateAllSpec's crash fixture). Such remnants
    * surface `<name>` as a site when the name is a known pointer
    * class, so the re-run completes the crashed migration.
    *
    * Contract: run writer-quiesced over the whole root (the same
    * discipline as the per-pointer verb, store-wide). A lock left by
    * a hard-crashed earlier migration blocks its site loudly;
    * re-run with `reclaimStaleLocks = true` AFTER confirming no other
    * migration is live — under the quiesced contract every
    * encountered lock is stale, but reclaiming is destructive enough
    * to demand the explicit flag. */
  def migrateAll(spark: SparkSession, root: String, to: CommitMode,
      reclaimStaleLocks: Boolean = false): Seq[String] = {
    val hfs = fs(spark, root)
    val rootPath = new Path(root)
    if (!hfs.exists(rootPath)) return Seq.empty
    val sites = scala.collection.mutable.LinkedHashSet.empty[Path]
    val migrateRemnant = "^\\.(.+)\\.migrate(_lock)?$".r
    def walk(dir: Path): Unit =
      hfs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (!name.startsWith(".")) {
          if (PointerSiteNames(name)) sites += st.getPath
          else if (st.isDirectory) walk(st.getPath)
        } else name match {
          case migrateRemnant(base, _) if PointerSiteNames(base) =>
            // anchor on the listed entry's QUALIFIED parent, not the
            // walk argument: the root call receives the caller's
            // possibly-unqualified Path, and two spellings of one
            // root-level site (live entry + remnant) would both
            // survive the de-dup set and migrate twice (review r18)
            sites += new Path(st.getPath.getParent, base)
          case _ => ()
        }
      }
    walk(rootPath)
    val ordered = sites.toSeq.sortBy(_.toString)
    ordered.foreach { ptr =>
      if (reclaimStaleLocks) hfs.delete(migrateLockPath(ptr), false): Unit
      migratePointer(spark, ptr, to)
    }
    ordered.map(_.toString)
  }

  /** Write the migration stage in the target mode, verified complete
    * before the caller touches the live pointer. */
  private def stageValue(spark: SparkSession, hfs: FileSystem, stage: Path,
      payload: String, asManifestDir: Boolean): Unit = {
    if (asManifestDir) {
      hfs.mkdirs(stage): Unit
      createManifest(spark, stage, 0L, payload)
    } else {
      val out = hfs.create(stage, true)
      try out.write(encodePointer(payload)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    require(readPointerRaw(spark, hfs, stage).contains(payload),
      s"staged migration at $stage failed readback verification")
  }

  /** The id-axis late-audit arithmetic, ONE spelling for both dedup
    * operators (review wave r16: the two copies had already been
    * pasted once — the drift seam the repo's one-spelling convention
    * exists to close): `total` is the input frame's row count (lazy —
    * not evaluated when `audit` is false), `nFresh` the past-mark
    * count already in hand. Returns (baseline tally, lateRows).
    * BASELINE CAVEAT (the IncrementalProtocol chunk-fed caveat, id
    * axis): when no tally is stored (legacy mark, or after an
    * unaudited refresh), the baseline presumes the CURRENT input's
    * below-mark rows incorporated — so the BASELINING refresh must see
    * the full corpus; a delta-fed baseline pins too low and the next
    * full-corpus audit over-reports the difference as late loss. Once
    * a full-feed baseline exists, delta feeds under-report clamped at
    * 0 and the next full feed reads exactly again. */
  private[graft] def idAxisAudit(audit: Boolean, total: => Long,
      nFresh: Long, incStored: Option[Long]): (Long, Long) =
    if (!audit) (-1L, -1L)
    else {
      val below = total - nFresh
      val i0 = incStored.getOrElse(below)
      (i0, math.max(0L, below - i0))
    }

  /** Refuse a mis-fed id-axis `reconcile` BEFORE it wipes state — ONE
    * spelling for both dedup operators (ADVICE r16: reconcile wiped
    * the watermark and every state directory before looking at its
    * input, so an empty — or accidentally delta-fed — frame destroyed
    * all committed state and returned DedupRefreshResult(0, 0) with no
    * refusal). Three loud checks, all cheap next to the full rebuild
    * the verb is about to pay: an empty frame can never be "the full
    * corpus"; a max id below the stored watermark proves the feed is
    * missing documents the committed state has already seen; and a
    * row count below the committed corpus tally proves the same even
    * when the feed DOES contain the max id (r18 directive 4 — the
    * one-directional guard's blind spot: a partial feed that happened
    * to include the newest document sailed through and still wiped
    * state). Max id EQUAL to the mark is legal (a reconcile that
    * repairs late below-mark rows adds no new ids), and so is a count
    * EQUAL to the tally (the identical-corpus re-feed) or above it
    * (the late-repair superset feed, `log ∪ lateArrivals`). The floor
    * is available exactly when the last refresh was audited — the
    * tally and the mark advance in one swap (the G44 invariant); an
    * unaudited refresh drops the tally and this check honestly
    * degrades to the max-id direction until the next audited one
    * re-baselines. Runs under the caller's lock so the watermark read
    * is consistent with the wipe decision. */
  private[graft] def assertFullCorpusFeed(spark: SparkSession,
      docs: DataFrame, idCol: String, statePath: String,
      what: String): Unit = {
    val r = docs.agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.max(col(idCol))).head()
    val n = r.getLong(0)
    if (n == 0L) throw new IllegalStateException(
      s"$what reconcile at $statePath fed an EMPTY frame — reconcile " +
        "is a stop-the-world rebuild from the FULL corpus; an empty " +
        "feed would erase all committed state. Nothing was wiped.")
    val maxId = r.getLong(1)
    val (wm, tally) = graft.registry.Incremental
      .watermarkState(spark, statePath)
    if (wm != Long.MinValue && maxId < wm) throw new IllegalStateException(
      s"$what reconcile at $statePath fed a frame whose max $idCol " +
        s"($maxId) is BELOW the committed watermark ($wm) — the feed is " +
        "provably not the full corpus (the state has incorporated " +
        "higher ids), so rebuilding from it would erase documents. " +
        "Nothing was wiped; feed the full corpus, or delete the state " +
        "directory explicitly if the corpus genuinely shrank.")
    for (floor <- tally if wm != Long.MinValue && n < floor)
      throw new IllegalStateException(
        s"$what reconcile at $statePath fed $n rows where the committed " +
          s"state incorporated $floor — the feed is provably not the " +
          "full corpus even though it reaches the watermark (a partial " +
          "feed containing the newest documents). Nothing was wiped; " +
          "feed the full corpus, or delete the state directory " +
          "explicitly if the corpus genuinely shrank.")
  }

  /** Persist a captured late-arrival frame under `sink/late-<n>` —
    * the G45 quarantine convention carried onto the id axis (r17
    * directive 4: G48 counted late rows; this keeps the rows
    * themselves as evidence). Numbering is monotone create-style
    * (max existing + 1; refreshes serialize on the operator's lock,
    * so no two live writers race a number): a crash RETRY of the same
    * delivery appends a duplicate capture rather than losing one, and
    * [[readCapturedLate]] collapses duplicates by id — ids are the
    * identity on this axis, so the read-side dedup is exact. Empty
    * captures write nothing. Returns rows captured. */
  private[graft] def captureLate(spark: SparkSession, sink: String,
      rows: DataFrame): Long = {
    // persist around count+write: the capture frame is an anti-join
    // against operator state, and computing it twice (once to decide
    // emptiness, once to write) would double the advertised
    // one-anti-join cost (review wave r17)
    val cached = rows.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = cached.count()
      if (n > 0) {
        val p = new Path(sink)
        val hfs = fs(spark, sink)
        val next =
          if (!hfs.exists(p)) 0L
          else hfs.listStatus(p).toSeq
            .flatMap(_.getPath.getName.stripPrefix("late-").toLongOption)
            .maxOption.fold(0L)(_ + 1L)
        cached.write.mode("overwrite").parquet(s"$sink/late-$next")
      }
      n
    } finally cached.unpersist(): Unit
  }

  /** Union of every capture under `sink`, one row per id (duplicate
    * captures from crash retries collapse; latest delivery of an id
    * wins arbitrarily — by the id-axis contract an id's payload never
    * changes). Empty frame when nothing was ever captured. */
  private[graft] def readCapturedLate(spark: SparkSession, sink: String,
      schema: StructType, idCol: String): DataFrame = {
    val p = new Path(sink)
    val hfs = fs(spark, sink)
    val dirs =
      if (!hfs.exists(p)) Seq.empty
      else hfs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("late-"))
        .map(_.getPath.toString)
    if (dirs.isEmpty) emptyDf(spark, schema)
    else spark.read.parquet(dirs: _*)
      .select(schema.fieldNames.map(col).toSeq: _*)
      .dropDuplicates(idCol)
  }

  private def rebuildPath(statePath: String) =
    new Path(statePath, "_rebuild_pending")

  /** The stop-the-world-rebuild crash seam, closed (review wave r16):
    * a reconcile that wipes `_watermark` first and crashes mid-wipe
    * leaves OLD snapshot batch dirs beside no mark — a later plain
    * refresh would rebuild into `batch=init` (tag Long.MinValue),
    * advance the mark, and the surviving old-tag snapshot would
    * OUTRANK the rebuild in readSnapshotted's latest-tag resolution:
    * stale state served under a fresh mark, with the audit reading
    * zero. The marker makes the wipe observable: written before the
    * first delete, removed after the rebuild commits; [[refuseIfRebuildPending]]
    * turns any non-reconcile entry into a loud refusal whose recovery
    * (re-run reconcile — it holds the full corpus and re-wipes
    * idempotently) is stated. */
  private[graft] def beginRebuild(spark: SparkSession,
      statePath: String): Unit =
    writePointer(spark, rebuildPath(statePath), "wipe-in-progress")

  private[graft] def finishRebuild(spark: SparkSession,
      statePath: String): Unit =
    fs(spark, statePath).delete(rebuildPath(statePath), true): Unit

  private[graft] def refuseIfRebuildPending(spark: SparkSession,
      statePath: String, what: String): Unit =
    if (fs(spark, statePath).exists(rebuildPath(statePath)))
      throw new IllegalStateException(
        s"interrupted $what reconcile at $statePath: the state wipe began " +
          "but its rebuild never committed (_rebuild_pending marker). A " +
          "plain refresh here could resurrect surviving pre-wipe snapshot " +
          "state over the rebuild — re-run reconcile with the FULL corpus " +
          "(it re-wipes idempotently), or delete the state directory and " +
          "refresh from scratch")

  /** Union of all committed batch directories under `dir`. */
  def readCommitted(spark: SparkSession, dir: String, schema: StructType,
      wm: Long): DataFrame = {
    val dirs = committedBatches(spark, dir, wm).map(_._2)
    if (dirs.isEmpty) emptyDf(spark, schema)
    else spark.read.parquet(dirs: _*)
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Compacted read for state kept as `snapDir/batch=*` (full rewrites
    * at compaction) + `deltaDir/batch=*` (per-refresh deltas): latest
    * committed snapshot + the deltas past it. Both directories are
    * passed EXPLICITLY — the reader and the writer must name the same
    * paths, and deriving one from the other by concatenation is how a
    * silent split-brain happens. */
  def readSnapshotted(spark: SparkSession, snapDir: String, deltaDir: String,
      schema: StructType, wm: Long): DataFrame = {
    val snaps = committedBatches(spark, snapDir, wm).sortBy(_._1)
    val deltas = committedBatches(spark, deltaDir, wm)
      .filter(d => snaps.lastOption.forall(s => d._1 > s._1))
    val dirs = snaps.lastOption.toSeq.map(_._2) ++ deltas.map(_._2)
    if (dirs.isEmpty) emptyDf(spark, schema)
    else spark.read.parquet(dirs: _*)
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Prune for the snapshot+delta layout: keep the latest two committed
    * snapshots and every delta past the older retained one (lazy reader
    * frames from the previous generation stay readable across one
    * compaction). Best-effort — a failed delete costs disk, never
    * correctness. */
  def pruneSnapshotted(spark: SparkSession, snapDir: String, deltaDir: String,
      wm: Long): Unit = {
    val hfs = fs(spark, snapDir)
    def drop(dir: String): Unit =
      try hfs.delete(new Path(dir), true) catch { case _: Exception => () }
    val snaps = committedBatches(spark, snapDir, wm).sortBy(_._1)
    if (snaps.size > 2) snaps.dropRight(2).foreach(s => drop(s._2))
    for (keepFloor <- snaps.takeRight(2).headOption.map(_._1))
      committedBatches(spark, deltaDir, wm)
        .filter(_._1 <= keepFloor).foreach(d => drop(d._2))
  }
}
