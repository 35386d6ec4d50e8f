package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The training-corpus SINK (SURVEY §2 G19): chunk documents into
  * window/stride token slices (ChunkOps.chunkPlan — narrow, no shuffle),
  * pack the chunks into ~budget-token shards in stable (doc_id,
  * chunk_idx) order via the distributed prefix sum, and materialize one
  * parquet file per shard. This is what a trainer consumes: shard files
  * of near-equal token counts whose contents are reproducible from the
  * corpus alone (no RNG, no partition-layout dependence).
  *
  * Scale shape: chunking is per-row fan-out; packing shuffles only
  * (doc_id, chunk_idx, n_chunk_tokens) prefix-sum traffic plus one
  * repartition of the chunk text by shard — every stage keyed, nothing
  * single-partition, no driver state beyond the P-sized offset list.
  * One file per shard holds because the partitioned write splits a
  * hash-partitioned task's rows by shard: a shard's rows live in
  * exactly one task.
  *
  * Directory layout: `shard_group=G/shard_id=N/` with G = N div
  * `groupSize`. The grouping level exists purely for the filesystem: a
  * 100 T-token corpus at a 1 M-token budget is ~10⁸ shards, and 10⁸
  * sibling directories is a listing/metastore killer on any store —
  * grouped, the top level holds shards/groupSize entries and each group
  * a bounded groupSize, so no single listing ever exceeds
  * max(groupSize, shards/groupSize). A trainer still addresses one
  * shard by path, and shard_id remains globally contiguous.
  */
object TrainingExport {

  /** Chunk + pack + write `docs` (doc_id, text) as parquet shards under
    * `path/shard_group=G/shard_id=N/`. A shard may overrun `budget` by
    * at most one chunk (< `window` tokens — the contiguous-fill
    * contract). Returns the per-shard summary READ BACK from the
    * written artifact, so a green result certifies the files, not the
    * plan. */
  def writeShards(docs: DataFrame, path: String, window: Int = 512,
      stride: Int = 384, budget: Long = 1L << 20,
      numPartitions: Int = 32, groupSize: Int = 1024): DataFrame = {
    require(stride > 0 && stride <= window, s"stride $stride vs window $window")
    require(budget >= window, s"budget $budget below one chunk of $window")
    require(groupSize > 0, s"groupSize $groupSize must be positive")
    val chunks = ChunkOps.chunkPlan(docs, window, stride)
    // an all-empty corpus writes no partition files and the read-back
    // would die on schema inference — fail with the real reason instead
    require(!chunks.isEmpty, "no non-empty documents to export")
    val packed = RankOps.exclusivePrefixSum(chunks, "n_chunk_tokens", "_cum",
        numPartitions, col("doc_id"), col("chunk_idx"))
      .withColumn("shard_id", expr(s"_cum div $budget"))
      .drop("_cum")
    packed
      .withColumn("shard_group", expr(s"shard_id div $groupSize"))
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("doc_id"), col("chunk_idx"))
      .write.mode("overwrite").partitionBy("shard_group", "shard_id")
      .parquet(path)
    docs.sparkSession.read.parquet(path)
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_chunk_tokens")).as("n_tokens"))
  }

  /** The trainer-side read: shards `[fromShard, untilShard)` of a
    * [[writeShards]] artifact, RANGE-partitioned by shard_id with one
    * target partition per shard in the range, rows inside each
    * partition in (shard_id, doc_id, chunk_idx) training order.
    * `groupSize` must match the write. Both partition levels prune —
    * the shard_group range cuts the top-level directories, the shard_id
    * range the leaf dirs — so fetching a 100-shard slice of a 10⁸-shard
    * corpus reads ~100 files (TrainingExportSpec audits the
    * PartitionFilters).
    *
    * The partitioning contract, precisely: a shard NEVER splits across
    * partitions, and each partition holds a CONTIGUOUS ascending run of
    * whole shards, with partition order following shard order. With the
    * partition count equal to the range size that is typically exactly
    * one shard per partition — but range partitioning places boundaries
    * by sampling, so a partition can hold several adjacent shards (and
    * another end up empty); an epoch worker maps over partitions and
    * must consume each as "one or more whole shards, in order", not
    * assume a 1:1 shard↔partition bijection (this is what a
    * hash-partitioned read could NOT promise: hashing interleaves
    * non-adjacent shards into one partition). */
  def readShards(spark: org.apache.spark.sql.SparkSession, path: String,
      fromShard: Long, untilShard: Long,
      groupSize: Int = 1024): DataFrame = {
    require(untilShard - fromShard <= Int.MaxValue,
      s"shard range [$fromShard, $untilShard) too wide for one read — slice it")
    shardScan(spark, path, fromShard, untilShard, groupSize)
      .repartitionByRange((untilShard - fromShard).toInt, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("doc_id"), col("chunk_idx"))
  }

  /** The pruned scan [[readShards]] builds on — shards [fromShard,
    * untilShard) with both partition levels pushed to the parquet scan,
    * BEFORE the trainer-order repartition. Diagnostics that inspect the
    * files actually read (input_file_name survives only up to the first
    * exchange) measure on this. */
  private[graft] def shardScan(spark: org.apache.spark.sql.SparkSession,
      path: String, fromShard: Long, untilShard: Long,
      groupSize: Int): DataFrame =
    prunedScan(spark, path, fromShard, untilShard, groupSize)
      .select(col("shard_id").cast("long").as("shard_id"), col("doc_id"),
        col("chunk_idx"), col("n_chunk_tokens"), col("chunk_text"))

  /** The ONE definition of the two-level partition-pruned read: shards
    * `[fromShard, untilShard)` with the shard_group range cutting the
    * top-level directories and the shard_id range the leaves — shared
    * by the chunk reader and the token-sequence reader so the pruning
    * predicate cannot drift between them. */
  private[graft] def prunedScan(spark: org.apache.spark.sql.SparkSession,
      path: String, fromShard: Long, untilShard: Long,
      groupSize: Int): DataFrame = {
    require(fromShard >= 0 && untilShard > fromShard,
      s"bad shard range [$fromShard, $untilShard)")
    require(groupSize > 0, s"groupSize $groupSize must be positive")
    spark.read.parquet(path)
      .filter(col("shard_group").between(
          fromShard / groupSize, (untilShard - 1) / groupSize) &&
        col("shard_id") >= fromShard && col("shard_id") < untilShard)
  }

  /** The token-sequence sink: write [[TokenEncode.packSequences]]
    * output (seq_id, ids, n_tokens) as the same grouped
    * `shard_group=G/shard_id=N/` parquet layout as [[writeShards]],
    * `seqsPerShard` sequences per shard (shard_id = seq_id div
    * seqsPerShard — contiguous, so a shard is a contiguous slice of
    * the training stream). This is the artifact a trainer maps epochs
    * over when the pipeline runs all the way to ids: fixed-length
    * rows, shard files addressable by range, reproducible from
    * (corpus, merges, vocab, seqLen) alone. Returns the per-shard
    * summary read back from the written files, certifying the
    * artifact like writeShards does.
    *
    * The empty-pack probe runs `packed`'s plan once before the write —
    * deliberately: it is what makes an empty pack fail BEFORE
    * mode-overwrite truncates an existing artifact at `path`. Cache or
    * localCheckpoint a freshly-computed pack first (the 50× stress
    * does), or the probe and the write execute the encode+pack pipeline
    * twice. */
  def writeTokenShards(packed: DataFrame, path: String,
      seqsPerShard: Int = 1024, groupSize: Int = 1024): DataFrame = {
    require(seqsPerShard > 0, s"seqsPerShard $seqsPerShard must be positive")
    require(groupSize > 0, s"groupSize $groupSize must be positive")
    require(!packed.isEmpty, "no sequences to export")
    packed
      .withColumn("shard_id", expr(s"seq_id div $seqsPerShard"))
      .withColumn("shard_group", expr(s"shard_id div $groupSize"))
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("seq_id"))
      .write.mode("overwrite").partitionBy("shard_group", "shard_id")
      .parquet(path)
    packed.sparkSession.read.parquet(path)
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_seqs"), sum(col("n_tokens")).as("n_tokens"))
  }

  /** Trainer-side read of a [[writeTokenShards]] artifact: shards
    * `[fromShard, untilShard)`, two-level-pruned exactly like
    * [[readShards]] (same shared scan), range-partitioned with whole
    * contiguous shards per partition, rows in (shard_id, seq_id)
    * training order. */
  def readTokenShards(spark: org.apache.spark.sql.SparkSession,
      path: String, fromShard: Long, untilShard: Long,
      groupSize: Int = 1024): DataFrame = {
    require(untilShard - fromShard <= Int.MaxValue,
      s"shard range [$fromShard, $untilShard) too wide for one read — slice it")
    prunedScan(spark, path, fromShard, untilShard, groupSize)
      .select(col("shard_id").cast("long").as("shard_id"), col("seq_id"),
        col("ids"), col("n_tokens"))
      .repartitionByRange((untilShard - fromShard).toInt, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("seq_id"))
  }

  /** Per-epoch shard order: the permutation of shard ids [0, nShards)
    * a trainer visits in epoch `epoch` — (position, shard_id), position
    * dense from 0. Epoch-to-epoch shuffling is how pretraining avoids
    * re-presenting the corpus in an identical order every pass, and the
    * order must be DETERMINISTIC (resumable mid-epoch, identical on
    * every worker that computes it) without ever materializing a 10⁸-
    * element permutation on the driver: shards rank by
    * xxhash64(seed, epoch, shard_id) — a distributed sort of the
    * Zipf-free shard-id range, position assigned by the two-phase row
    * number (no single-partition window), ties (hash collisions) broken
    * by shard_id. Epoch 0 with the same seed reproduces the same order
    * on any cluster/layout (spec'd); different epochs decorrelate. */
  def epochSchedule(spark: org.apache.spark.sql.SparkSession,
      nShards: Long, epoch: Long, seed: Long = 0L,
      numPartitions: Int = 32): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    val ids = spark.range(nShards).select(col("id").as("shard_id"),
      xxhash64(lit(seed), lit(epoch), col("id")).as("_h"))
    RankOps.twoPhaseRowNumber(ids, "_pos", numPartitions,
        col("_h"), col("shard_id"))
      .select((col("_pos").cast("long") - 1L).as("position"), col("shard_id"))
  }

  /** One epoch worker's fetch of an ARBITRARY (scheduled, non-
    * contiguous) shard set from a [[writeTokenShards]] artifact — the
    * companion of [[epochSchedule]]: worker w of W takes the schedule's
    * positions [w·n/W, (w+1)·n/W), collects that slice's shard ids
    * (worker-slice-sized — bounded driver state, like the prefix-sum
    * offsets), and fetches them here. Both partition levels still
    * prune: the shard_group IN-set cuts top-level dirs, the shard_id
    * IN-set the leaves — a scattered 100-shard fetch of a 10⁸-shard
    * corpus still reads ~100 files (PartitionFilters spec-audited).
    * Rows arrive grouped by shard in (shard_id, seq_id) order; the
    * caller re-sequences shards into schedule order per its worker loop
    * (a partition holds whole shards of its hash range).
    *
    * A fetch wider than `maxInSet` (default 10⁴ — a generous worker
    * slice) switches from literal IN-lists to a broadcast left-semi
    * join on the id frame: a 10⁶-literal IN-set makes plan
    * analysis/serialization the bottleneck long before the read is.
    * The group-level IN stays literal while the GROUP list fits (it is
    * ids/groupSize-sized, and a literal partition filter prunes
    * statically); past that, both levels join and leaf pruning falls
    * to Spark's dynamic partition pruning on the broadcast keys. A
    * whole-epoch-sized fetch is still better served by the contiguous
    * [[readTokenShards]] over a range. */
  def readTokenShardsAt(spark: org.apache.spark.sql.SparkSession,
      path: String, shardIds: Seq[Long],
      groupSize: Int = 1024, maxInSet: Int = 10000): DataFrame = {
    require(shardIds.nonEmpty, "empty shard set — nothing to read")
    require(maxInSet > 0, s"maxInSet $maxInSet must be positive")
    val distinctIds = shardIds.distinct
    val groups = distinctIds.map(_ / groupSize).distinct
    val base = spark.read.parquet(path)
    val grouped =
      if (groups.length <= maxInSet) base.filter(col("shard_group").isin(groups: _*))
      else {
        import spark.implicits._
        base.join(broadcast(groups.toDF("shard_group")), Seq("shard_group"),
          "left_semi")
      }
    val picked =
      if (distinctIds.length <= maxInSet)
        grouped.filter(col("shard_id").isin(distinctIds: _*))
      else {
        import spark.implicits._
        grouped.join(broadcast(distinctIds.toDF("shard_id")), Seq("shard_id"),
          "left_semi")
      }
    picked
      .select(col("shard_id").cast("long").as("shard_id"), col("seq_id"),
        col("ids"), col("n_tokens"))
      .repartition(math.max(1, distinctIds.length), col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("seq_id"))
  }
}
