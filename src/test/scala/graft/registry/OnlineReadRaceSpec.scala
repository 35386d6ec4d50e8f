package graft.registry

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The resolve→read span of [[FeatureStore.readOnlineVectorLatest]]
  * against concurrent publish+prune — the r14 ADVICE flagged that a
  * reader whose resolved generation is reclaimed mid-read either threw
  * FileNotFound or (worse) read the missing bucket dir as "entity
  * absent". The read now re-resolves on a vanished generation; these
  * specs pin both the recovery and the bounded loud failure. */
class OnlineReadRaceSpec extends SparkSpec {

  private def storeWithFeature(): (FeatureStore, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-race").toString
    val fs = new FeatureStore(spark, s"$dir/values")
    fs.registerTable(TableDef("orders", Seq("o_custkey", "o_totalprice"),
      Map("o_totalprice" -> "numeric")), Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(fs.computeVersion("total_spend", "v1").isRight)
    val id = fs.featureVectors().select("entity_id")
      .limit(1).collect().head.getString(0)
    (fs, id)
  }

  test("point reads survive publish+prune(keep=1) racing the resolve->read span") {
    val (fs, id) = storeWithFeature()
    val base = java.nio.file.Files.createTempDirectory("graft-race-gens").toString
    fs.publishOnlineGeneration(base, buckets = 4)
    val expected = FeatureStore.readOnlineVectorLatest(spark, base, id)
    assert(expected.nonEmpty)

    // the most hostile retention: every publish reclaims everything but
    // the new pointer target, so any reader holding the previous
    // resolve mid-read loses its generation
    @volatile var writerErr: Option[Throwable] = None
    @volatile var done = false
    val writer = new Thread(() => {
      try for (_ <- 1 to 3) {
        fs.publishOnlineGeneration(base, buckets = 4)
        FeatureStore.pruneOnlineGenerations(spark, base, keep = 1): Unit
      } catch { case t: Throwable => writerErr = Some(t) }
      finally done = true
    })
    writer.start()
    var reads = 0
    try while (!done) {
      // identical store content every generation: any successful read
      // must return the same vector regardless of which side of a swap
      // or prune it lands on — and no read may throw or come back empty
      val got = FeatureStore.readOnlineVectorLatest(spark, base, id)
      assert(got === expected, s"read $reads diverged mid-race")
      reads += 1
    } finally writer.join()
    writerErr.foreach(throw _)
    assert(reads > 0, "reader never overlapped the writer")
    assert(FeatureStore.readOnlineVectorLatest(spark, base, id) === expected)
  }

  test("an absent entity reads as empty, never as a spurious prune-race error") {
    val (fs, _) = storeWithFeature()
    val base = java.nio.file.Files.createTempDirectory("graft-race-absent").toString
    fs.publishOnlineGeneration(base, buckets = 4)
    // review-wave finding: the retry loop must distinguish "every
    // attempt died on a vanished generation" (loud) from "every
    // attempt read a complete empty vector" (the entity is absent —
    // empty IS the answer, even if publishes land inside read spans)
    assert(FeatureStore.readOnlineVectorLatest(spark, base,
      "entity-that-never-existed") === Map.empty)
  }

  test("a pointer stuck on a reclaimed generation fails loudly naming the keep window") {
    val (fs, id) = storeWithFeature()
    val base = java.nio.file.Files.createTempDirectory("graft-race-stale").toString
    fs.publishOnlineGeneration(base, buckets = 4)
    // simulate the unrecoverable form: the pointer names a generation
    // that no longer exists and no further publish will fix it (drop
    // the Hadoop crc sidecar the real publish left — a hand-edited
    // pointer beside a stale crc is a different failure, ChecksumException)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$base/._latest.crc"))
    val w = new java.io.FileWriter(s"$base/_latest")
    w.write("gen=99"); w.close()
    val e = intercept[IllegalStateException] {
      FeatureStore.readOnlineVectorLatest(spark, base, id)
    }
    assert(e.getMessage.contains("keep"),
      s"failure must name the recovery knob: ${e.getMessage}")
  }
}
