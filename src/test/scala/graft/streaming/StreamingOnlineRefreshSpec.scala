package graft.streaming

import graft.{SparkSpec, Tables}
import graft.registry._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}

case class OnlineCorr(entity_id: String, value: Double, ts: Timestamp,
    feature_name: String, version: String)

/** G33×G40 loop closure: per micro-batch, corrections merge into the
  * value store and the online view republishes behind the atomic
  * `_latest` swap — a concurrent reader only ever resolves complete
  * generations and sees the corrected value after the swap. */
class StreamingOnlineRefreshSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sor-$tag").toString

  private def t(s: String) = Timestamp.valueOf(s)

  private def toLong(df: org.apache.spark.sql.DataFrame) =
    df.select(col("entity_id"), col("value"),
      lit(null).cast("string").as("value_str"),
      col("ts").as("computed_at"), col("feature_name"), col("version"))

  test("mid-stream readers resolve only complete generations; corrections surface after the swap", graft.Slow) {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("store")
    val vsf = new ParquetValueStore(spark, s"$dir/values")
    val fs = new FeatureStore(spark, s"$dir/values",
      valueFormat = Some(vsf))
    val base = s"$dir/online"

    fs.registerTable(TableDef("orders", Seq("o_custkey", "o_totalprice"),
      Map("o_totalprice" -> "numeric")), Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(fs.computeVersion("total_spend", "v1").isRight)

    // batch handoff seeds gen=0; pick a real entity and remember v0
    fs.publishOnlineGeneration(base, buckets = 4)
    val id = fs.featureVectors().select("entity_id")
      .orderBy("entity_id").first().getString(0)
    val v0 = FeatureStore.readOnlineVectorLatest(spark, base, id)("total_spend")
      .asInstanceOf[Double]

    // concurrent poller: from gen=0 on, EVERY resolution must succeed
    // (no pointerless window, no half-written generation) and must
    // return one of the values that ever existed for this entity
    val legal = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Double, java.lang.Boolean]())
    legal.add(v0); legal.add(111111.11); legal.add(222222.22)
    val stopPoll = new AtomicBoolean(false)
    val polls = new AtomicInteger(0)
    val pollError = new AtomicReference[Throwable](null)
    val poller = new Thread(() => {
      while (!stopPoll.get()) {
        try {
          val got = FeatureStore.readOnlineVectorLatest(spark, base, id)
          val v = got("total_spend").asInstanceOf[Double]
          if (!legal.contains(v))
            throw new IllegalStateException(s"illegal mid-stream value $v")
          polls.incrementAndGet(): Unit
        } catch {
          case e: Throwable => pollError.compareAndSet(null, e); stopPoll.set(true)
        }
      }
    })
    poller.start()

    val mem = MemoryStream[OnlineCorr]
    val q = StreamingOnlineRefresh.writer(
        toLong(mem.toDS().toDF()), fs, vsf, base,
        checkpoint = s"$dir/ckpt", buckets = 4, keep = Some(2))
      .queryName("online_refresh").start()
    try {
      mem.addData(OnlineCorr(id, 111111.11, t("2024-06-01 00:00:00"),
        "total_spend", "v1"))
      q.processAllAvailable()
      assert(FeatureStore.readOnlineVectorLatest(spark, base, id)("total_spend")
        === 111111.11, "first correction not visible after the swap")
      mem.addData(OnlineCorr(id, 222222.22, t("2024-06-01 01:00:00"),
        "total_spend", "v1"))
      q.processAllAvailable()
      assert(FeatureStore.readOnlineVectorLatest(spark, base, id)("total_spend")
        === 222222.22, "second correction not visible after the swap")
    } finally {
      q.stop()
      stopPoll.set(true)
      poller.join(30000)
    }
    assert(pollError.get() === null,
      s"a mid-stream reader failed: ${pollError.get()}")
    assert(polls.get() > 0, "the poller never completed a read")

    // per-batch pruning bounded the layout: ≤ keep generations remain
    // and the pointer target is among them
    val gens = new java.io.File(base).listFiles
      .filter(_.getName.startsWith("gen=")).map(_.getName)
    assert(gens.length <= 2, s"pruning did not bound generations: ${gens.toSeq}")
    val current = new java.io.File(
      FeatureStore.resolveOnlineLatest(spark, base)).getName
    assert(gens.contains(current))

    // the served batch path agrees with the online layout after the stream
    assert(fs.getVector(id)("total_spend") === 222222.22)
  }

  test("empty batch is a full no-op: no merge, no generation churn") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("noop")
    val vsf = new ParquetValueStore(spark, s"$dir/values")
    val fs = new FeatureStore(spark, s"$dir/values", valueFormat = Some(vsf))
    val base = s"$dir/online"
    fs.registerTable(TableDef("orders", Seq("o_custkey", "o_totalprice"),
      Map("o_totalprice" -> "numeric")), Tables.orders(spark, sf))
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    assert(fs.computeVersion("total_spend", "v1").isRight)
    fs.publishOnlineGeneration(base, buckets = 4)
    val before = new java.io.File(base).listFiles
      .filter(_.getName.startsWith("gen=")).map(_.getName).toSet

    val empty = toLong(Seq.empty[OnlineCorr].toDF())
    assert(StreamingOnlineRefresh.applyBatch(fs, vsf, empty, base,
      buckets = 4) === None)
    val after = new java.io.File(base).listFiles
      .filter(_.getName.startsWith("gen=")).map(_.getName).toSet
    assert(after === before, "an empty batch churned a generation")
  }
}
