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

  test("pointer format: roundtrip, awkward payloads, legacy passthrough") {
    for (p <- Seq("42", "gen=17", "-9223372036854775808 1234",
        "_stats_index_g3", "a|b|c", "two\nlines", "")) {
      assert(BatchedState.decodePointer(BatchedState.encodePointer(p),
        "test") === p, s"roundtrip broke for '$p'")
    }
    // legacy bare payloads (pre-format files) pass through trimmed
    assert(BatchedState.decodePointer("12345\n", "test") === "12345")
    assert(BatchedState.decodePointer("gen=7", "test") === "gen=7")
  }

  test("pointer format: a torn prefix and a corrupted byte both refuse loudly") {
    val enc = BatchedState.encodePointer("1754900000000 8812")
    // copy-style rename interrupted mid-file: every strict prefix that
    // still carries the G2| magic must refuse, never parse as a
    // shorter watermark
    for (cut <- 3 until enc.length) {
      val e = intercept[IllegalStateException] {
        BatchedState.decodePointer(enc.take(cut), "wmfile")
      }
      assert(e.getMessage.contains("wmfile"), "refusal must name the file")
    }
    // single-byte corruption inside the payload
    val flipped = enc.dropRight(1) + (if (enc.last == '0') '1' else '0')
    intercept[IllegalStateException] {
      BatchedState.decodePointer(flipped, "wmfile")
    }
  }

  test("writePointer/readPointer: torn file on disk refuses; legacy file reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ptr").toString
    val p = new Path(s"$dir/_watermark")
    assert(BatchedState.readPointer(spark, p).isEmpty)
    BatchedState.writePointer(spark, p, "987654321 55")
    assert(BatchedState.readPointer(spark, p) === Some("987654321 55"))
    // simulate the object-store tear: truncate the file in place
    val full = readAll(p)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/._watermark.crc"))
    writeVia(p, full.take(full.length / 2))
    intercept[IllegalStateException] { BatchedState.readPointer(spark, p) }
    // legacy (pre-format) bare content still reads
    writeVia(p, "42\n")
    assert(BatchedState.readPointer(spark, p) === Some("42"))
  }
}
