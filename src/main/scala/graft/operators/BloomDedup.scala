package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter membership dedup — the BOUNDED-MEMORY member of the
  * dedup family (SURVEY §2 C10), and the mechanism the Dolma corpus
  * ships (Soldaini et al. 2024 §2.2: document- and paragraph-level
  * dedup via a Bloom filter over content hashes; CCNet's shard-hash
  * tables are the same idea with exact sets). Where C1 exact dedup
  * shuffles every key and G17's incremental form keeps the full seen-key
  * table, a Bloom filter answers "seen before?" in a FIXED byte budget
  * chosen up front from (expectedItems, fpp) — the trade is a one-sided
  * error: a novel key can FALSE-POSITIVE at rate ≈ fpp and be wrongly
  * dropped (over-drop), but an inserted key can never test negative
  * (no under-drop, no duplicate survives). That is the OPPOSITE
  * collision class from the engine's xxhash64 conventions (which can
  * merge at ≈2⁻⁶⁴, never miss) — callers pick the filter when the seen
  * set is too large to keep exactly and a ~fpp loss of novel documents
  * is acceptable (Dolma's adjudication; fpp is the knob).
  *
  * Scale shape — why this is NOT Spark's built-in `stat.bloomFilter`:
  * the built-in tree-aggregates ONE filter onto the driver, capping the
  * filter at driver memory (100 B paragraphs at fpp 1e-3 need
  * ~14.4 bits/key ≈ 180 GB — no driver holds that). Here the filter IS
  * a DataFrame, hash-partitioned into `shards` rows of (shard,
  * words: map<word_idx, 64-bit lane>): [[build]] is one explode into
  * (shard, word, lane-mask) rows + one map-side-combinable keyed
  * `bit_or` + one per-shard reassembly — no filter bytes ever
  * concentrate; [[mightContain]] is one shard-keyed join (broadcast
  * while the filter fits, size-based planner once it doesn't) + a
  * row-local k-probe bit test in built-in expressions (no UDF). Each
  * shard row is bounded by `maxShardBits` (default 2²⁶ bits = 8 MiB of
  * lanes), so the 180 GB filter above is ~22k modest rows spread over
  * the cluster. Membership against a FROZEN filter is a stream-static
  * join — stateless, stream-transparent (the C9 frozen-index
  * convention); only [[build]]/[[merge]] touch corpus-sized data.
  *
  * Probe arithmetic (pinned; the spec's single-node reference folds the
  * same numbers): h1 = xxhash64(seed, key) mod m, h2 = (xxhash64(seed+1,
  * key) | 1) mod m (odd, and m is a multiple of 64, so h2 ≠ 0),
  * position_i = (h1 + i·h2) mod m for i < k — Kirsch–Mitzenmacher
  * double hashing, mod-first so no term overflows (ANSI-safe: i·h2 ≤
  * k·m ≪ 2⁶³). The shard is an independent hash (seed+2) so shard
  * choice and in-shard positions do not correlate. Inserting a key
  * twice is idempotent; intra-batch duplicates are C1's job (a
  * distributed build cannot test-and-insert sequentially — document
  * order inside one build carries no meaning).
  *
  * Filter-frame layout (self-describing, the QualityClassifier reserved
  * -row convention): data rows (shard ≥ 0, words = sorted-key map of
  * only the TOUCHED 64-bit lanes) plus one meta row shard = −1 with
  * words = {0→mBits/shard, 1→k, 2→shards, 3→seed, 4→nInserted}.
  * Untouched shards have no row — membership left-joins and a missing
  * shard or lane reads as zero bits.
  */
object BloomDedup {

  private val MetaShard = -1

  /** Optimal total bit count for `expectedItems` at `fpp`:
    * ceil(−n·ln p / ln²2), the textbook sizing. */
  def optimalBits(expectedItems: Long, fpp: Double): Long =
    math.ceil(-expectedItems.toDouble * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong.max(64L)

  /** Optimal probe count for `mBits` total bits over `expectedItems`:
    * round(m/n·ln 2), clamped to [1, 30]. */
  def optimalHashes(mBits: Long, expectedItems: Long): Int =
    math.round(mBits.toDouble / expectedItems.toDouble * math.log(2))
      .toInt.max(1).min(30)

  /** (mBitsPerShard, k, shards) for a build: total bits from
    * (expectedItems, fpp), sharded so no shard exceeds `maxShardBits`,
    * per-shard bits rounded up to whole 64-bit lanes. */
  def plan(expectedItems: Long, fpp: Double,
      maxShardBits: Long = 1L << 26): (Long, Int, Int) = {
    val mTotal = optimalBits(expectedItems, fpp)
    val shards = ((mTotal + maxShardBits - 1) / maxShardBits).toInt.max(1)
    val perShard = ((mTotal / shards + 63L) / 64L) * 64L
    (perShard.max(64L), optimalHashes(mTotal, expectedItems), shards)
  }

  // --- shared probe expressions (build and test MUST agree bit-for-bit)

  private def shardCol(key: Column, seed: Long, shards: Int): Column =
    pmod(xxhash64(lit(seed + 2), key), lit(shards.toLong)).cast("int")

  private def positionsCol(key: Column, seed: Long, mBits: Long,
      k: Int): Column = {
    val h1 = pmod(xxhash64(lit(seed), key), lit(mBits))
    val h2 = pmod(xxhash64(lit(seed + 1), key).bitwiseOR(lit(1L)), lit(mBits))
    transform(sequence(lit(0L), lit(k - 1L)),
      i => pmod(h1 + i * h2, lit(mBits)))
  }

  /** Fail-loud null probe (the QualityClassifier maxDocTokens
    * convention): a null key has no hash — silently routing it to one
    * shard would make every null "a duplicate of the first null". */
  private def requireNoNullKeys(docs: DataFrame, keyCol: String,
      what: String): Unit = {
    val bad = docs.filter(col(keyCol).isNull).limit(1).collect()
    require(bad.isEmpty,
      s"$what: null values in key column '$keyCol' — a null has no " +
        "hash identity; filter or coalesce upstream")
  }

  private def metaMap(filter: DataFrame, what: String): Map[Long, Long] = {
    val rows = filter.filter(col("shard") === MetaShard)
      .select(col("words")).collect()
    require(rows.length == 1,
      s"$what: filter frame carries ${rows.length} meta rows (shard = " +
        s"$MetaShard), expected exactly 1 — was it produced by " +
        "BloomDedup.build?")
    rows(0).getAs[Map[Long, Long]](0)
  }

  /** Build a sharded Bloom filter over `docs(keyCol)` (cast to string;
    * dedup keys are text — normalize first with TextNorm for the CCNet
    * key convention, or explode paragraphs first for Dolma's
    * paragraph-level form). Sizing comes from [[plan]] unless
    * `shardsOverride`/`mBitsOverride`/`kOverride` pin it (merging
    * filters requires identical parameters). One explode + one keyed
    * bit_or + one per-shard reassembly; nothing filter-sized touches
    * the driver. */
  def build(docs: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01, seed: Long = 0L,
      maxShardBits: Long = 1L << 26): DataFrame = {
    require(expectedItems >= 1, s"expectedItems $expectedItems must be >= 1")
    require(fpp > 0 && fpp < 1, s"fpp $fpp out of (0, 1)")
    require(maxShardBits >= 64, s"maxShardBits $maxShardBits must be >= 64")
    requireNoNullKeys(docs, keyCol, "BloomDedup.build")
    val (mBits, k, shards) = plan(expectedItems, fpp, maxShardBits)
    val spark = docs.sparkSession
    val keyed = docs.select(col(keyCol).cast("string").as("_k"))
    val nInserted = keyed.count()
    val lanes = keyed
      .select(shardCol(col("_k"), seed, shards).as("shard"),
        explode(positionsCol(col("_k"), seed, mBits, k)).as("_pos"))
      .select(col("shard"), expr("_pos div 64").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").as("_m"))
      .groupBy(col("shard"), col("word"))
      .agg(expr("bit_or(_m)").as("bits"))
      .groupBy(col("shard"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("word"), col("bits"))))).as("words"))
    lanes.unionByName(spark.range(1).select(
      lit(MetaShard).as("shard"),
      map(lit(0L), lit(mBits), lit(1L), lit(k.toLong),
        lit(2L), lit(shards.toLong), lit(3L), lit(seed),
        lit(4L), lit(nInserted)).as("words")))
  }

  /** Label every row of `docs` with `seen` = whether `keyCol` tests
    * positive against `filter`. No false negatives: every key a build
    * or merge inserted tests true. False positives at ≈ the built fpp:
    * `seen = true` on a genuinely novel key wrongly drops it — the
    * documented one-sided error. One shard-keyed left join (broadcast
    * by default — a filter frame is shards rows; pass
    * `broadcastFilter = false` past broadcast size, the E22/E23
    * convention) + a row-local k-probe test. Stream-transparent against
    * a frozen filter (stream-static join, no state). */
  def mightContain(docs: DataFrame, filter: DataFrame, keyCol: String,
      broadcastFilter: Boolean = true): DataFrame = {
    requireNoNullKeys(docs, keyCol, "BloomDedup.mightContain")
    val meta = metaMap(filter, "BloomDedup.mightContain")
    val (mBits, k, shards, seed) = (meta(0L), meta(1L).toInt,
      meta(2L).toInt, meta(3L))
    val data = filter.filter(col("shard") >= 0)
      .select(col("shard").cast("int").as("_fshard"), col("words").as("_words"))
    val keyed = docs
      .withColumn("_k", col(keyCol).cast("string"))
      .withColumn("_fshard", shardCol(col("_k"), seed, shards))
      .withColumn("_pos", positionsCol(col("_k"), seed, mBits, k))
    keyed
      .join(if (broadcastFilter) broadcast(data) else data,
        Seq("_fshard"), "left")
      // a missing shard row or untouched lane reads as zero bits —
      // try_element_at (not element_at: ANSI mode throws on absent keys)
      .withColumn("seen", coalesce(expr(
        "forall(_pos, p -> (coalesce(try_element_at(_words, p div 64), " +
          "CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), " +
          "CAST(p % 64 AS INT))) != CAST(0 AS BIGINT))"),
        lit(false)))
      .drop("_k", "_fshard", "_pos", "_words")
  }

  /** The Dolma keep rule: rows of `docs` whose key the filter has NOT
    * seen — the incremental-ingest form (filter carries history, the
    * delta streams through; compose with C1 for intra-delta
    * duplicates, which no frozen filter can see). */
  def filterNovel(docs: DataFrame, filter: DataFrame, keyCol: String,
      broadcastFilter: Boolean = true): DataFrame =
    mightContain(docs, filter, keyCol, broadcastFilter)
      .filter(!col("seen")).drop("seen")

  /** Merge two filters built with IDENTICAL parameters (bitwise OR of
    * lanes — the Bloom union law: the merged filter answers exactly as
    * a single build over the union of inserts, spec'd). Mismatched
    * parameters fail loudly — OR-ing differently-sized filters answers
    * garbage. */
  def merge(a: DataFrame, b: DataFrame): DataFrame = {
    val ma = metaMap(a, "BloomDedup.merge (left)")
    val mb = metaMap(b, "BloomDedup.merge (right)")
    require((0L to 3L).forall(i => ma(i) == mb(i)),
      s"cannot merge Bloom filters with different parameters: " +
        s"(mBits, k, shards, seed) left = ${(0L to 3L).map(ma)}, " +
        s"right = ${(0L to 3L).map(mb)}")
    val lanes = a.unionByName(b).filter(col("shard") >= 0)
      .select(col("shard"), explode(map_entries(col("words"))).as("_e"))
      .select(col("shard"), col("_e.key").as("word"),
        col("_e.value").as("_m"))
      .groupBy(col("shard"), col("word"))
      .agg(expr("bit_or(_m)").as("bits"))
      .groupBy(col("shard"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("word"), col("bits"))))).as("words"))
    lanes.unionByName(a.sparkSession.range(1).select(
      lit(MetaShard).as("shard"),
      map(lit(0L), lit(ma(0L)), lit(1L), lit(ma(1L)),
        lit(2L), lit(ma(2L)), lit(3L), lit(ma(3L)),
        lit(4L), lit(ma(4L) + mb(4L))).as("words")))
  }

  /** Occupancy report (the IvfIndex.stats convention — the filter's
    * recall never decays, but its FALSE-POSITIVE rate climbs with fill;
    * this is where that shows): per-shard touched lanes + set bits,
    * plus a total row with the observed fill fraction and the estimated
    * CURRENT fpp = fill^k (the standard estimate). Computed from the
    * shards-row filter frame alone — never from a corpus. */
  def stats(filter: DataFrame): DataFrame = {
    val meta = metaMap(filter, "BloomDedup.stats")
    val (mBits, k, shards) = (meta(0L), meta(1L).toInt, meta(2L).toInt)
    val per = filter.filter(col("shard") >= 0)
      .select(col("shard"),
        size(col("words")).cast("long").as("n_words"),
        aggregate(map_values(col("words")), lit(0L),
          (acc, v) => acc + bit_count(v).cast("long")).as("set_bits"))
    val total = per.agg(
        coalesce(sum(col("set_bits")), lit(0L)).as("sb"))
      .select(lit(MetaShard).as("shard"), lit(shards.toLong * mBits / 64L)
          .as("n_words"), col("sb").as("set_bits"),
        (col("sb").cast("double") / lit(shards.toDouble * mBits))
          .as("fill"),
        pow(col("sb").cast("double") / lit(shards.toDouble * mBits),
          lit(k.toDouble)).as("est_fpp"))
    per.withColumn("fill", col("set_bits").cast("double") / lit(mBits.toDouble))
      .withColumn("est_fpp", pow(col("fill"), lit(k.toDouble)))
      .unionByName(total)
  }

  /** Persist a filter durably on the [[ModelStore]] `_meta`
    * atomic-commit convention (writer-locked, keep-two retention) —
    * the artifact a streaming/incremental gate reloads each session
    * (the C9 boilerplate-index twin). Lanes write EXPLODED (shard,
    * word, bits) — parquet-friendly long columns, re-assembled lazily
    * on load. The meta row is validated against the WRITTEN files
    * before the meta swap (the writeShards read-back convention). */
  def save(filter: DataFrame, path: String): Unit = {
    val spark = filter.sparkSession
    ModelStore.withLock(spark, path, "BloomDedup filter") {
      val g = ModelStore.nextGen(spark, path)
      val meta = metaMap(filter, "BloomDedup.save")
      val dir = ModelStore.genDir(path, g, "lanes")
      filter.filter(col("shard") >= 0)
        .select(col("shard").cast("int").as("shard"),
          explode(map_entries(col("words"))).as("_e"))
        .select(col("shard"), col("_e.key").as("word"),
          col("_e.value").as("bits"))
        .write.mode("overwrite").parquet(dir)
      val written = spark.read.parquet(dir)
        .agg(coalesce(sum(expr("bit_count(bits)")), lit(0)).cast("long"))
        .head().getLong(0)
      val claimed = filter.filter(col("shard") >= 0)
        .agg(coalesce(sum(aggregate(map_values(col("words")), lit(0L),
          (acc, v) => acc + bit_count(v).cast("long"))), lit(0L)))
        .head().getLong(0)
      require(written == claimed,
        s"written lanes carry $written set bits, the frame claims " +
          s"$claimed — torn write, nothing committed")
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "bloom_filter", "gen" -> g.toString,
        "mBits" -> meta(0L).toString, "k" -> meta(1L).toString,
        "shards" -> meta(2L).toString, "seed" -> meta(3L).toString,
        "nInserted" -> meta(4L).toString))
      ModelStore.pruneGens(spark, path, g)
    }
  }

  /** Reopen a committed filter in any session: the same self-describing
    * frame [[mightContain]]/[[merge]] take, lanes lazy over the
    * committed generation's parquet. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val kv = ModelStore.readMeta(spark, path, "BloomDedup filter")
    ModelStore.checkKind(kv, path, "bloom_filter", "1")
    val lanes = spark.read
      .parquet(ModelStore.genDir(path, kv("gen").toLong, "lanes"))
      .groupBy(col("shard"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("word"), col("bits"))))).as("words"))
    lanes.unionByName(spark.range(1).select(
      lit(MetaShard).as("shard"),
      map(lit(0L), lit(kv("mBits").toLong), lit(1L), lit(kv("k").toLong),
        lit(2L), lit(kv("shards").toLong), lit(3L), lit(kv("seed").toLong),
        lit(4L), lit(kv("nInserted").toLong)).as("words")))
  }
}
