package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** TrainingExport writes the artifact a trainer reads — so every check
  * here runs against the parquet on disk, not the plan: content parity
  * with the chunking plan, the budget-overrun bound, shard contiguity
  * in corpus order, and the one-file-per-shard layout contract. */
class TrainingExportSpec extends SparkSpec {
  import spark.implicits._

  private val dir = java.nio.file.Files
    .createTempDirectory("graft-export").toString + "/shards"
  private val (w, s, budget) = (32, 24, 400L)

  // groupSize small enough that this corpus spans several groups, so
  // the grouped layout is actually exercised, not vacuously one dir
  private val groupSize = 8
  private lazy val summary = TrainingExport.writeShards(
    Tables.documents(spark, sf).select("doc_id", "text"),
    dir, window = w, stride = s, budget = budget, numPartitions = 4,
    groupSize = groupSize)

  test("written shards hold exactly the chunking plan's content") {
    summary.collect() // force the write
    val expected = ChunkOps.chunkPlan(
        Tables.documents(spark, sf).select("doc_id", "text"), w, s)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSet
    val got = spark.read.parquet(dir)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === expected)
  }

  test("every shard is within budget + one chunk, and ids are contiguous") {
    val shards = summary.as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(shards.nonEmpty)
    assert(shards.map(_._1).toSeq === shards.indices.map(_.toLong))
    // contiguous fill: a shard stops growing only once the NEXT chunk
    // would start past the budget boundary, so tokens < budget + window
    shards.foreach { case (id, _, tok) =>
      assert(tok < budget + w, s"shard $id holds $tok tokens")
    }
    // and all but the last shard reached the boundary
    shards.dropRight(1).foreach { case (id, _, tok) =>
      assert(tok >= budget - w, s"shard $id underfilled at $tok tokens")
    }
  }

  test("shards partition the corpus in (doc_id, chunk_idx) order") {
    val byShard = spark.read.parquet(dir)
      .select(col("shard_id").cast("long"), col("doc_id"), col("chunk_idx"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (id, rows) => (id, rows.map(r => (r._2, r._3)).sorted) }
    byShard.sliding(2).foreach {
      case Seq((_, a), (_, b)) =>
        assert(Ordering[(Long, Long)].lt(a.last, b.head),
          "shard contents must not interleave in corpus order")
      case _ =>
    }
  }

  test("an empty corpus fails loudly, not at read-back schema inference") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TrainingExport.writeShards(empty, dir + "-empty", window = w, stride = s,
        budget = budget, numPartitions = 2)
    }
    assert(e.getMessage.contains("no non-empty documents"))
  }

  test("readShards returns exactly the requested range, in training order, with both partition levels pruned") {
    val nShards = summary.count()
    assert(nShards > 10, "corpus too small for a meaningful range read")
    val got = TrainingExport.readShards(spark, dir, 2L, 7L, groupSize = groupSize)
    got.cache()
    // exactly shards [2, 7), content identical to a full-scan filter
    val expected = spark.read.parquet(dir)
      .filter(col("shard_id") >= 2 && col("shard_id") < 7)
      .select(col("doc_id"), col("chunk_idx")).as[(Long, Long)].collect().toSet
    assert(got.select("shard_id").distinct().as[Long].collect().sorted
      === Array(2L, 3L, 4L, 5L, 6L))
    assert(got.select("doc_id", "chunk_idx").as[(Long, Long)].collect().toSet
      === expected)
    // training order: within every partition, rows ascend by
    // (shard_id, doc_id, chunk_idx) — what an epoch worker consumes
    import org.apache.spark.sql.Row
    got.select("shard_id", "doc_id", "chunk_idx").foreachPartition {
      (it: Iterator[Row]) =>
        val rows = it.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        require(rows == rows.sorted, s"partition out of training order: $rows")
    }
    // the pruning is real, not just planned: the scan touches exactly
    // one file per requested shard (measured pre-exchange, where
    // input_file_name still carries the source file)
    val files = TrainingExport.shardScan(spark, dir, 2L, 7L, groupSize)
      .select(input_file_name()).distinct().count()
    assert(files === 5L, s"range read touched $files files for 5 shards")
    // both partition levels must surface as partition filters on the scan
    val p = got.queryExecution.executedPlan.toString
    val scan = p.split('\n').filter(_.contains("FileScan"))
    assert(scan.nonEmpty)
    scan.foreach { l =>
      val pf = l.indexOf("PartitionFilters:")
      val filters = if (pf >= 0) l.substring(pf).takeWhile(_ != ']') else ""
      assert(filters.contains("shard_group") && filters.contains("shard_id"),
        s"range read not pruned on both levels:\n$l")
    }
  }

  test("readShards partitioning contract: whole shards, contiguous ascending runs per partition") {
    val nShards = summary.count()
    assert(nShards > 10)
    val got = TrainingExport.readShards(spark, dir, 1L, 11L, groupSize = groupSize)
    // per-partition shard runs, in partition order
    val runs = got.select("shard_id").rdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.map(_.getLong(0)).toArray.distinct.sorted.toSeq))
      }.collect().sortBy(_._1).map(_._2)
    // a shard never splits across partitions
    val all = runs.flatten.toSeq
    assert(all.length === all.distinct.length,
      s"a shard appeared in two partitions: ${runs.toSeq}")
    assert(all.sorted === (1L to 10L), s"wrong shard set: ${runs.toSeq}")
    // each non-empty partition holds a contiguous run, and the runs
    // ascend in partition order (the range-partitioning contract an
    // epoch worker consumes; hash partitioning interleaved shards here)
    runs.filter(_.nonEmpty).foreach { r =>
      assert(r === (r.head to r.last), s"non-contiguous run $r") }
    val nonEmpty = runs.filter(_.nonEmpty).toSeq
    nonEmpty.sliding(2).foreach {
      case Seq(a, b) => assert(a.last < b.head,
        s"partition runs out of shard order: ${runs.toSeq}")
      case _ =>
    }
  }

  test("mixtureRepeat composes with writeShards: epochs occupy real shard space") {
    // an all-sources 3000 per-mille recipe: every document exactly 3
    // epochs, deterministically (remainder 0 — no md5 draw involved)
    val base = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 80).select("doc_id", "source", "text").cache()
    val recipe = base.select("source").distinct()
      .withColumn("keep_per_mille", lit(3000L))
    // copies share doc_id, so a doc-keyed consumer must epoch-qualify
    // the id before packing — the documented composition contract
    val repeated = CurationOps.mixtureRepeat(base, recipe)
      .select((col("doc_id") * 3 + col("epoch")).as("doc_id"), col("text"))
    val dirA = java.nio.file.Files.createTempDirectory("graft-mix-a").toString + "/s"
    val dirB = java.nio.file.Files.createTempDirectory("graft-mix-b").toString + "/s"
    val one = TrainingExport.writeShards(base.select("doc_id", "text"), dirA,
      window = w, stride = s, budget = budget, numPartitions = 4,
      groupSize = groupSize)
    val three = TrainingExport.writeShards(repeated, dirB,
      window = w, stride = s, budget = budget, numPartitions = 4,
      groupSize = groupSize)
    val t1 = one.agg(sum("n_tokens")).head().getLong(0)
    val t3 = three.agg(sum("n_tokens")).head().getLong(0)
    assert(t3 === 3 * t1,
      s"3 epochs must export exactly 3x the tokens: $t1 vs $t3")
    assert(three.count() >= one.count())
  }

  test("token shards: packSequences -> writeTokenShards -> readTokenShards is bit-exact and pruned", graft.Slow) {
    // the full text -> tensor-ready path on the real table: learn
    // merges, freeze a vocab, encode, pack to 32-id rows, shard 4
    // sequences per shard, then read a slice back as a trainer would
    val docsDf = Tables.documents(spark, sf)
      .filter(col("doc_id") < 120).select("doc_id", "text").cache()
    val merges = TokenizerTrain.learnMerges(docsDf, 6)
    val vocab = TokenEncode.buildVocab(docsDf, merges)
    val packed = TokenEncode.packSequences(
      TokenEncode.encodeCorpus(docsDf, merges, vocab), 32).cache()
    val out = java.nio.file.Files
      .createTempDirectory("graft-tokshard").toString + "/shards"
    val summ = TrainingExport.writeTokenShards(packed, out,
      seqsPerShard = 4, groupSize = groupSize).cache()
    val nSeqs = packed.count()
    assert(summ.count() === (nSeqs - 1) / 4 + 1)
    assert(summ.agg(sum("n_seqs")).head().getLong(0) === nSeqs)
    // the whole artifact, read back in training order, IS the packed
    // stream: same sequences, same ids, nothing reordered or lost
    val nShards = summ.count()
    val back = TrainingExport.readTokenShards(spark, out, 0L, nShards,
        groupSize = groupSize)
      .select("seq_id", "ids").as[(Long, Seq[Long])].collect().sortBy(_._1)
    val ref = packed.select("seq_id", "ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    assert(back.toSeq === ref.toSeq)
    // a slice reads only its shards' files, pruned at both levels
    val slice = TrainingExport.readTokenShards(spark, out, 1L, 3L,
      groupSize = groupSize)
    assert(slice.select("shard_id").distinct().as[Long].collect().sorted
      === Array(1L, 2L))
    val p = slice.queryExecution.executedPlan.toString
    val scan = p.split('\n').filter(_.contains("FileScan"))
    assert(scan.nonEmpty)
    scan.foreach { l =>
      val pf = l.indexOf("PartitionFilters:")
      val filters = if (pf >= 0) l.substring(pf).takeWhile(_ != ']') else ""
      assert(filters.contains("shard_group") && filters.contains("shard_id"),
        s"token-shard read not pruned on both levels:\n$l")
    }
    // shards are contiguous slices of the training stream: shard_id is
    // seq_id div seqsPerShard on every written row
    val bad = spark.read.parquet(out)
      .filter(col("shard_id").cast("long") =!= expr("seq_id div 4")).count()
    assert(bad === 0L)
    // one parquet file per shard dir — the writeShards file contract
    // holds for the token artifact too (hash repartition keeps a
    // shard's rows in one task; partitionBy splits tasks by dir)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard_group=")).flatMap(_.listFiles())
      .filter(_.getName.startsWith("shard_id="))
    assert(shardDirs.length.toLong === nShards)
    shardDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) === 1,
        s"expected exactly one parquet file in $d")
    }
    // an epoch worker's SCHEDULED (scattered, non-contiguous) fetch:
    // exactly the asked-for shards, same rows as the contiguous read
    // filtered to them, still pruned at both partition levels
    val sched = TrainingExport.epochSchedule(spark, nShards, epoch = 1L)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(sched.map(_._1).toSeq === (0L until nShards).toSeq)
    assert(sched.map(_._2).sorted.toSeq === (0L until nShards).toSeq)
    val wanted = sched.take(2).map(_._2)
    val scat = TrainingExport.readTokenShardsAt(spark, out, wanted.toSeq,
      groupSize = groupSize)
    assert(scat.select("shard_id").distinct().as[Long].collect().sorted
      === wanted.sorted)
    val scatScans = scat.queryExecution.executedPlan.toString
      .split('\n').filter(_.contains("FileScan"))
    assert(scatScans.nonEmpty)
    scatScans.foreach { l =>
      val pf = l.indexOf("PartitionFilters:")
      val filters = if (pf >= 0) l.substring(pf).takeWhile(_ != ']') else ""
      assert(filters.contains("shard_group") && filters.contains("shard_id"),
        s"scattered token-shard read not pruned on both levels:\n$l")
    }
    val scatRows = scat.select("seq_id", "ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    assert(scatRows.toSeq ===
      ref.filter(r => wanted.contains(r._1 / 4)).sortBy(_._1).toSeq)
    // a fetch wider than maxInSet switches both levels to a broadcast
    // semi-join (the large-IN plan-analysis cliff): identical rows, and
    // the join really is the broadcast kind, never a shuffle of the ids
    val joined = TrainingExport.readTokenShardsAt(spark, out, wanted.toSeq,
      groupSize = groupSize, maxInSet = 1)
    val joinedRows = joined.select("seq_id", "ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    assert(joinedRows.toSeq === scatRows.toSeq,
      "semi-join path must return exactly the IN-set path's rows")
    val jp = joined.queryExecution.executedPlan.toString
    assert(jp.contains("BroadcastHashJoin") && jp.contains("LeftSemi"),
      s"large fetch must broadcast-semi-join the id frame:\n$jp")
    // an empty pack fails loudly, matching writeShards
    val e = intercept[IllegalArgumentException] {
      TrainingExport.writeTokenShards(packed.filter(lit(false)), out + "-e")
    }
    assert(e.getMessage.contains("no sequences"))
  }

  test("epochSchedule: deterministic permutation per epoch, decorrelated across epochs and seeds") {
    val n = 64L
    val e3 = TrainingExport.epochSchedule(spark, n, 3L)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    // layout-independent: a different partition count, same order
    val e3b = TrainingExport.epochSchedule(spark, n, 3L, numPartitions = 7)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(e3.toSeq === e3b.toSeq)
    assert(e3.sorted.toSeq === (0L until n).toSeq, "not a permutation")
    val e4 = TrainingExport.epochSchedule(spark, n, 4L)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(e4.sorted.toSeq === (0L until n).toSeq, "not a permutation")
    assert(e4.toSeq !== e3.toSeq, "epochs must decorrelate")
    val seeded = TrainingExport.epochSchedule(spark, n, 3L, seed = 9L)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(seeded.toSeq !== e3.toSeq, "seeds must decorrelate")
    intercept[IllegalArgumentException] {
      TrainingExport.epochSchedule(spark, 0L, 0L)
    }
    intercept[IllegalArgumentException] {
      TrainingExport.readTokenShardsAt(spark, "/nowhere", Seq.empty)
    }
  }

  test("grouped layout: shard dirs nest under shard_group = shard_id div groupSize, one parquet file each") {
    val nShards = summary.count()
    val root = new java.io.File(dir)
    val groupDirs = root.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_group="))
    // the top-level listing is groups, not shards — the thing that keeps
    // a 10^8-shard corpus from becoming 10^8 sibling directories
    assert(groupDirs.length.toLong === (nShards - 1) / groupSize + 1)
    assert(nShards > groupSize, "corpus too small to exercise grouping")
    val shardDirs = groupDirs.flatMap { g =>
      val gid = g.getName.stripPrefix("shard_group=").toLong
      g.listFiles().filter(_.getName.startsWith("shard_id=")).map { d =>
        val sid = d.getName.stripPrefix("shard_id=").toLong
        assert(sid / groupSize === gid,
          s"shard $sid filed under wrong group ${g.getName}")
        d
      }
    }
    assert(shardDirs.length.toLong === nShards)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName} has ${files.length} files")
    }
  }
}
