package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BloomDedupSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")

  private val N = 500L // sf0.001 documents row count (asserted below)

  /** Exploded, canonically-ordered view of a filter frame for exact
    * frame comparison (map column equality is order-sensitive in some
    * paths — compare lane sets instead). */
  private def lanes(filter: DataFrame): Seq[(Int, Long, Long)] =
    filter.filter(col("shard") >= 0)
      .select(col("shard"), explode(map_entries(col("words"))).as("e"))
      .select(col("shard").cast("int"), col("e.key"), col("e.value"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  private def meta(filter: DataFrame): Map[Long, Long] =
    filter.filter(col("shard") === -1).select(col("words"))
      .head().getAs[Map[Long, Long]](0)

  test("build matches a single-node fold of the documented probe arithmetic") {
    val fpp = 0.01
    val (m, k, shards) = BloomDedup.plan(N, fpp)
    val seed = 0L
    // re-derive shard/positions INDEPENDENTLY from the pinned contract
    // (h1/h2 mod-first double hashing, shard on seed+2), then fold the
    // filter single-node and compare lane-for-lane
    val key = col("text").cast("string")
    val h1 = pmod(xxhash64(lit(seed), key), lit(m))
    val h2 = pmod(xxhash64(lit(seed + 1), key).bitwiseOR(lit(1L)), lit(m))
    val probed = docs.select(
      pmod(xxhash64(lit(seed + 2), key), lit(shards.toLong)).cast("int")
        .as("shard"),
      transform(sequence(lit(0L), lit(k - 1L)),
        i => pmod(h1 + i * h2, lit(m))).as("pos"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1)))
    assert(probed.length == N)
    val expected = scala.collection.mutable.Map[(Int, Long), Long]()
    for ((s, ps) <- probed; p <- ps) {
      val w = (s, p / 64)
      expected(w) = expected.getOrElse(w, 0L) | (1L << (p % 64).toInt)
    }
    val built = BloomDedup.build(docs, "text", N, fpp, seed)
    assert(lanes(built) ===
      expected.toSeq.map { case ((s, w), b) => (s, w, b) }.sorted)
    val mm = meta(built)
    assert((mm(0L), mm(1L), mm(2L), mm(3L), mm(4L)) ===
      ((m, k.toLong, shards.toLong, seed, N)))
  }

  test("no false negatives; novel-key false positives near the designed fpp") {
    val filter = BloomDedup.build(docs, "text", N, fpp = 0.01)
    // every inserted key tests positive — the Bloom guarantee
    val seenOwn = BloomDedup.mightContain(docs, filter, "text")
    assert(seenOwn.filter(!col("seen")).count() === 0)
    // novel keys false-positive at ~fpp (20k trials; 3x head-room)
    val novel = spark.range(20000)
      .select(concat(lit("novel key "), col("id")).as("text"))
    val fp = BloomDedup.mightContain(novel, filter, "text")
      .filter(col("seen")).count()
    assert(fp <= 600, s"false-positive count $fp over 20000 novel keys " +
      "exceeds 3x the designed fpp=0.01")
    // and filterNovel keeps exactly the unseen complement
    assert(BloomDedup.filterNovel(novel, filter, "text").count()
      === 20000 - fp)
  }

  test("merge of same-parameter filters equals one build over the union") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    // same (expectedItems, fpp) => same (m, k, shards); merge requires it
    val fa = BloomDedup.build(a, "text", N, fpp = 0.01)
    val fb = BloomDedup.build(b, "text", N, fpp = 0.01)
    val merged = BloomDedup.merge(fa, fb)
    val full = BloomDedup.build(docs, "text", N, fpp = 0.01)
    assert(lanes(merged) === lanes(full))
    assert(meta(merged)(4L) === meta(full)(4L)) // nInserted adds up
  }

  test("build is layout-invariant") {
    val one = BloomDedup.build(docs, "text", N, fpp = 0.01)
    val other = BloomDedup.build(docs.repartition(7), "text", N, fpp = 0.01)
    assert(lanes(one) === lanes(other))
  }

  test("frozen-filter delta flow: history flagged, novel kept, merge closes") {
    val v1 = docs.filter(col("doc_id") < 250)
    val delta = docs.filter(col("doc_id") >= 250)
    val f1 = BloomDedup.build(v1, "text", N, fpp = 0.01)
    val labeled = BloomDedup.mightContain(docs, f1, "text")
    assert(labeled.filter(col("doc_id") < 250 && !col("seen")).count() === 0)
    val fpDelta = labeled.filter(col("doc_id") >= 250 && col("seen")).count()
    assert(fpDelta <= 25, s"$fpDelta of 250 novel delta docs false-positived")
    // fold the delta in; everything now tests positive
    val f2 = BloomDedup.merge(f1, BloomDedup.build(delta, "text", N, 0.01))
    assert(BloomDedup.mightContain(docs, f2, "text")
      .filter(!col("seen")).count() === 0)
  }

  test("broadcast and shuffle membership joins agree; no single-partition stage") {
    val filter = BloomDedup.build(docs, "text", N, fpp = 0.01)
    val bc = BloomDedup.mightContain(docs, filter, "text")
    val sh = BloomDedup.mightContain(docs, filter, "text",
      broadcastFilter = false)
    assert(bc.select("doc_id", "seen").collect().map(r =>
        (r.getLong(0), r.getBoolean(1))).sorted.toSeq ===
      sh.select("doc_id", "seen").collect().map(r =>
        (r.getLong(0), r.getBoolean(1))).sorted.toSeq)
    val plan = bc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast membership join:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"unexpected single-partition exchange:\n$plan")
    val buildPlan = BloomDedup.build(docs, "text", N, fpp = 0.01)
      .queryExecution.executedPlan.toString
    assert(!buildPlan.contains("Exchange SinglePartition"),
      s"unexpected single-partition exchange in build:\n$buildPlan")
  }

  test("stats reports exact set-bit counts and a near-design fpp estimate") {
    val filter = BloomDedup.build(docs, "text", N, fpp = 0.01)
    val expectedBits = lanes(filter).map(l => java.lang.Long.bitCount(l._3))
      .map(_.toLong).sum
    val st = BloomDedup.stats(filter)
    val total = st.filter(col("shard") === -1).head()
    assert(total.getAs[Long]("set_bits") === expectedBits)
    val estFpp = total.getAs[Double]("est_fpp")
    assert(estFpp > 0.001 && estFpp < 0.03,
      s"est_fpp $estFpp far from the designed 0.01")
    // per-shard rows recombine to the total
    val perShardSum = st.filter(col("shard") >= 0)
      .agg(sum(col("set_bits"))).head().getLong(0)
    assert(perShardSum === expectedBits)
  }

  test("multi-shard plan: oversized filters split with lanes intact") {
    // force tiny shards so the real table spans several
    val filter = BloomDedup.build(docs, "text", N, fpp = 0.01,
      maxShardBits = 1024)
    val mm = meta(filter)
    assert(mm(2L) > 1, s"expected multiple shards, got ${mm(2L)}")
    assert(BloomDedup.mightContain(docs, filter, "text")
      .filter(!col("seen")).count() === 0)
    // every lane's shard is within range and words within the shard width
    val maxWord = (mm(0L) + 63) / 64
    assert(lanes(filter).forall { case (s, w, _) =>
      s >= 0 && s < mm(2L) && w >= 0 && w < maxWord })
  }

  test("artifact round-trip; wrong-kind load refused") {
    val filter = BloomDedup.build(docs, "text", N, fpp = 0.01)
    val dir = java.nio.file.Files.createTempDirectory("bloom-artifact").toString
    BloomDedup.save(filter, dir)
    val loaded = BloomDedup.load(spark, dir)
    assert(lanes(loaded) === lanes(filter))
    assert(meta(loaded) === meta(filter))
    assert(BloomDedup.mightContain(docs, loaded, "text")
      .filter(!col("seen")).count() === 0)
    // a second save retains readability of the prior generation handle
    BloomDedup.save(BloomDedup.merge(filter, filter), dir)
    assert(lanes(loaded) === lanes(filter))
    // wrong kind fails naming both kinds
    val other = java.nio.file.Files.createTempDirectory("bloom-kind").toString
    ModelStore.writeMeta(spark, other, Seq(
      "version" -> "1", "kind" -> "tokenizer", "gen" -> "0"))
    val e = intercept[IllegalArgumentException] {
      BloomDedup.load(spark, other) }
    assert(e.getMessage.contains("tokenizer") &&
      e.getMessage.contains("bloom_filter"))
  }

  test("guards: sizing bounds, null keys, mismatched merge, missing meta row") {
    intercept[IllegalArgumentException] {
      BloomDedup.build(docs, "text", 0L) }
    intercept[IllegalArgumentException] {
      BloomDedup.build(docs, "text", N, fpp = 1.0) }
    val withNull = docs.select(
      when(col("doc_id") === 3, lit(null)).otherwise(col("text")).as("text"))
    val eNull = intercept[IllegalArgumentException] {
      BloomDedup.build(withNull, "text", N) }
    assert(eNull.getMessage.contains("null"))
    val f0 = BloomDedup.build(docs, "text", N, fpp = 0.01, seed = 0L)
    val f7 = BloomDedup.build(docs, "text", N, fpp = 0.01, seed = 7L)
    val eSeed = intercept[IllegalArgumentException] {
      BloomDedup.merge(f0, f7) }
    assert(eSeed.getMessage.contains("parameters"))
    val eMeta = intercept[IllegalArgumentException] {
      BloomDedup.mightContain(docs, f0.filter(col("shard") >= 0), "text") }
    assert(eMeta.getMessage.contains("meta"))
  }

  test("empty build: meta-only filter on which nothing tests positive") {
    val none = BloomDedup.build(docs.filter(lit(false)), "text", N)
    assert(lanes(none).isEmpty)
    assert(meta(none)(4L) === 0L)
    assert(BloomDedup.mightContain(docs, none, "text")
      .filter(col("seen")).count() === 0)
  }
}
