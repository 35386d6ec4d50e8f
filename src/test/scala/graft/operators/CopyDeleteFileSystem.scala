package graft.operators

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}

/** The object-store rename, simulated: COPY bytes then DELETE the
  * source — nothing atomic anywhere, with an injectable crash point so
  * specs can reproduce the two real failure shapes of a mid-"rename"
  * crash on such stores:
  *
  *  - `armCrash(0)`: the destination's old content is gone and the
  *    copy never started — the pointer is LOST (reads as absent);
  *  - `armCrash(k>0)`: the copy stopped after k bytes — the pointer is
  *    TORN (a prefix of the intended content).
  *
  * [[CommitModeSpec]] drives [[BatchedState.writePointer]] through this
  * filesystem in both commit modes: rename mode exhibits exactly these
  * failures (detected loudly by the G2 checksum, but the pointer is
  * still unreadable until an operator restores it); manifest mode
  * never calls rename at all — `renames` counts the proof — so neither
  * failure shape exists on its commit path.
  *
  * Scheme `cdfs`; local-disk backed (RawLocalFileSystem keeps no crc
  * sidecars, so byte-level tampering in specs needs no sidecar dance). */
class CopyDeleteFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "cdfs"
  override def getUri: URI = URI.create("cdfs:///")

  override def rename(src: Path, dst: Path): Boolean = {
    CopyDeleteFileSystem.renames.incrementAndGet(): Unit
    val in = open(src)
    val buf = new java.io.ByteArrayOutputStream()
    try {
      val b = new Array[Byte](8192)
      var n = in.read(b)
      while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
    } finally in.close()
    val data = buf.toByteArray
    // the copy+delete shape: the destination's old content goes first
    delete(dst, false): Unit
    val keep = CopyDeleteFileSystem.crashAfterBytes.getAndSet(-1)
    if (keep == 0) throw new java.io.IOException(
      "simulated crash: dst deleted, copy not started (pointer lost)")
    val out = create(dst, true)
    try out.write(if (keep > 0) data.take(keep) else data)
    finally out.close()
    if (keep > 0) throw new java.io.IOException(
      s"simulated crash: copy truncated at $keep bytes (pointer torn)")
    delete(src, false): Unit
    true
  }
}

object CopyDeleteFileSystem {
  /** Renames performed through this scheme — a commit path that never
    * increments it provably cannot tear. */
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
  /** One-shot crash injection for the NEXT rename: -1 = complete
    * normally; 0 = crash after the dst delete; k>0 = crash after
    * copying k bytes. Self-resets. */
  private val crashAfterBytes = new java.util.concurrent.atomic.AtomicInteger(-1)
  def armCrash(afterBytes: Int): Unit = crashAfterBytes.set(afterBytes)
}

/** FileContext-side registration of the same filesystem (Hadoop keeps
  * two registries; [[BatchedState.atomicReplace]]'s non-local branch
  * goes through FileContext, which resolves AbstractFileSystems). */
class CopyDeleteAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(
    uri, new CopyDeleteFileSystem, conf, "cdfs", false)
