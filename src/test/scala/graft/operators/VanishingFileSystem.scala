package graft.operators

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FSDataInputStream, FileStatus, Path, RawLocalFileSystem}

/** The READ-side analogue of [[CopyDeleteFileSystem]] (r18 directive 2):
  * an injectable filesystem that fires a one-shot action at the exact
  * read STEP a spec chooses — `stat` (getFileStatus, which `exists`
  * routes through), `list` (listStatus, which DataSource resolution and
  * parquet file listing route through), or `open` (file open, which
  * pointer reads and parquet footer/page reads route through) — on the
  * first path containing the armed marker.
  *
  * Why: the online read/prune race surface had been explored by TIMING
  * LUCK — three distinct race shapes found across three rounds, each
  * when suite scheduling happened to align
  * (registry/OnlineReadRaceSpec stays as that live canary). With this
  * shim the prune/migrate transition lands at a CHOSEN step of the
  * reader's sequence, so every reader-vs-prune and reader-vs-migrate
  * interleaving is a deterministic table row, not a 1-in-3 flake —
  * and a missing retry shape is found by construction (it found the
  * fourth: a completed migratePointer swapping the pointer's shape
  * between a reader's stat and open, with the lock already released).
  *
  * The action typically mutates the underlying local directory tree
  * directly (delete a generation, move a pointer) — exactly the state
  * a racing prune/publisher/migrator would leave — and then the
  * intercepted operation proceeds against the mutated tree, failing
  * (or succeeding) precisely as the real race would.
  *
  * Scheme `vanish`; local-disk backed via RawLocalFileSystem (no crc
  * sidecars, so specs mutate files without the sidecar dance). Actions
  * are one-shot (compareAndSet) and may fire on an executor task
  * thread — local-mode tests share the JVM, so plain java.nio file
  * mutation inside the action is safe. */
class VanishingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "vanish"
  override def getUri: URI = URI.create("vanish:///")

  override def getFileStatus(f: Path): FileStatus = {
    VanishingFileSystem.fire("stat", f); super.getFileStatus(f)
  }
  override def listStatus(f: Path): Array[FileStatus] = {
    VanishingFileSystem.fire("list", f); super.listStatus(f)
  }
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    VanishingFileSystem.fire("open", f); super.open(f, bufferSize)
  }
}

object VanishingFileSystem {
  final case class Trap(step: String, marker: String, action: () => Unit)
  private val trap = new java.util.concurrent.atomic.AtomicReference[Trap](null)
  /** How many traps have fired since JVM start — a spec asserts its
    * armed step was actually reached (an interleaving that never fires
    * proved nothing). */
  val fired = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Arm ONE action to fire at the next `step` operation whose path
    * contains `marker`. One-shot: consumed atomically on fire. */
  def arm(step: String, marker: String)(action: => Unit): Unit =
    trap.set(Trap(step, marker, () => action))

  def disarm(): Unit = trap.set(null)

  private def fire(step: String, p: Path): Unit = {
    val t = trap.get()
    if (t != null && t.step == step && p.toString.contains(t.marker) &&
        trap.compareAndSet(t, null)) {
      fired.incrementAndGet(): Unit
      t.action()
    }
  }
}

/** FileContext-side registration (the [[CopyDeleteAbstractFs]]
  * convention — Hadoop keeps two registries and
  * [[BatchedState.atomicReplace]]'s non-local branch resolves
  * AbstractFileSystems). */
class VanishingAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(
    uri, new VanishingFileSystem, conf, "vanish", false)
