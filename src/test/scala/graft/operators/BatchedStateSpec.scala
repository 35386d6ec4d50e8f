package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The swap primitive's local-scheme contract — found live by the r14
  * 50× sweep: a bm25 index `_meta` written by the PRE-atomicReplace
  * code (checksummed Hadoop write → `.crc` sidecar) and then swapped
  * by the NIO path stranded the old sidecar beside the new content,
  * and every later Hadoop read died with ChecksumException. Fresh-dir
  * specs cannot see this; the upgrade path (old state, new code) is
  * exactly what this spec constructs. */
class BatchedStateSpec extends SparkSpec {

  private def hfsOf(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readAll(p: Path): String = {
    val in = hfsOf(p).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def writeVia(p: Path, s: String): Unit = {
    val o = hfsOf(p).create(p, true)
    try o.write(s.getBytes("UTF-8")) finally o.close()
  }

  test("atomicReplace over a checksummed legacy file: Hadoop reads verify, no stale crc") {
    val dir = java.nio.file.Files.createTempDirectory("graft-areplace").toString
    val dst = new Path(s"$dir/_meta")
    // legacy state: written in place through the checksummed
    // LocalFileSystem, so a ._meta.crc sidecar exists for the OLD bytes
    writeVia(dst, "old-generation")
    assert(new java.io.File(dir, "._meta.crc").exists,
      "precondition failed: no crc sidecar — the test would be vacuous")

    val tmp = new Path(s"$dir/_meta.tmp")
    writeVia(tmp, "new-generation")
    BatchedState.atomicReplace(spark, tmp, dst)
    // checksum-verifying Hadoop read must succeed AND see the new
    // content (the pre-fix swap left old-crc-beside-new-bytes here)
    assert(readAll(dst) === "new-generation")

    // repeated swaps stay healthy and leak no tmp sidecars
    writeVia(tmp, "gen-3")
    BatchedState.atomicReplace(spark, tmp, dst)
    assert(readAll(dst) === "gen-3")
    assert(!new java.io.File(dir, "._meta.tmp.crc").exists,
      "tmp crc sidecar leaked")
  }
}
