package graft.bench

import graft.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress HARNESS (measurement code, not engine — it lives in
  * `graft.bench` so the main tree proper stays engine-only): multiplies the sf0.1 tables N× on disk (ids
  * remapped so keys stay unique) and runs the headline operators —
  * evidence that plans hold past the oracle SF, not just at it.
  *
  * `SPARK_GRAFT_STRESS_MULT` (default 20) → ~12M lineitem rows,
  * 2M events, 100k docs at 20×. Run:
  *   SPARK_GRAFT_STRESS_MULT=20 sbt "runMain graft.bench.Stress"
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "20").toInt
    val src = "/root/testdata/sf0.1"
    val dir = s"/tmp/graft-stress-x$mult"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def blowUp(name: String, idCols: Seq[String], shift: Long): Unit = {
      val out = s"$dir/$name.parquet"
      if (!new java.io.File(out).exists()) {
        // route through the typed loader so events' nanos ts converts
        val base = if (name == "events") Tables.events(spark, src)
                   else Tables.load(spark, src, name)
        val copies = spark.range(mult).withColumnRenamed("id", "_copy")
        val big = idCols.foldLeft(base.crossJoin(copies))(
          (df, c) => df.withColumn(c, col(c) + col("_copy") * shift))
          .drop("_copy")
        big.write.mode("overwrite").parquet(out)
      }
    }
    // dims are copied UNMULTIPLIED (unique primary keys preserved): the
    // stress models mult× more facts per dimension row. Multiplying a
    // dim with shift=0 would duplicate every key mult times and inflate
    // each dim join's output mult-fold — a data bug, not a scale test
    // (it made q3 look superlinear at 50×).
    def copyDim(name: String): Unit = {
      val out = s"$dir/$name.parquet"
      if (!new java.io.File(out).exists())
        Tables.load(spark, src, name).write.mode("overwrite").parquet(out)
    }
    // key shift keeps ids disjoint between copies; FK pairs shift together
    blowUp("lineitem", Seq("l_orderkey"), 10000000L)
    blowUp("orders", Seq("o_orderkey"), 10000000L)
    copyDim("customer")
    copyDim("nation")
    copyDim("region")
    copyDim("supplier")
    copyDim("part")
    blowUp("events", Seq("event_id"), 10000000L)    // same users, mult× events each
    blowUp("documents", Seq("doc_id"), 10000000L)
    blowUp("embeddings", Seq("vec_id"), 10000000L)

    // time the noop-sink materialization: .count() would let Catalyst
    // drop windows/projections the count doesn't need (a 5M-row window
    // query "finishing" in 0.2s is the count shortcut, not the work);
    // rows are recounted afterwards, untimed
    // SPARK_GRAFT_STRESS_ONLY=bm25,tfidf runs just the scenarios whose
    // name contains a listed token — a re-measure of one operator should
    // not pay the full ~30 min sweep (data gen above is idempotent and
    // always runs; it's a no-op once the blown-up tables exist)
    val only: Option[Seq[String]] =
      sys.env.get("SPARK_GRAFT_STRESS_ONLY")
        .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
    def enabled(name: String): Boolean = only.forall(_.exists(name.contains))
    def scenario(name: String)(body: => Unit): Unit =
      if (enabled(name)) body

    def time(name: String)(f: => DataFrame): Unit = if (enabled(name)) {
      val t0 = System.nanoTime() // before f: iterative ops run jobs eagerly
      val df = f
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS $name%-28s $dt%8.2f s   rows=${df.count()}")
    }

    // warm
    Tables.lineitem(spark, dir).count()

    // q1_pricing IS the integer-cents form now (CoreQueries adopted the
    // formulation this harness measured in round 2: 13 s vs the decimal
    // path's 35-40 s at 50×, identical exactness)
    time("q1_pricing")(CoreQueries.q1Pricing(spark, dir))
    // same aggregation with plain double sums — quantifies what exact
    // cross-engine arithmetic still costs vs unordered FP accumulation
    time("q1_double_sums") {
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") <= expr("TIMESTAMP '2000-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }
    time("q6_filter_agg")(CoreQueries.q6FilterAgg(spark, dir))
    time("q3_topk")(CoreQueries.q3TopK(spark, dir))
    time("feat_customer_stats")(CoreQueries.featCustomerStats(spark, dir))
    time("feat_sessionize")(FeatureOps.featSessionize(spark, dir))
    time("feat_rolling_agg")(FeatureOps.featRollingAgg(spark, dir))
    time("feat_pit_join")(FeatureOps.featPitJoin(spark, dir))
    time("dedup_exact")(Dedup.dedupExact(spark, dir))
    time("text_quality")(TextOps.textQuality(spark, dir))
    time("dedup_minhash")(Dedup.dedupMinhash(spark, dir)) // md5 oracle form
    // the cluster-scale form: xxhash64 lanes + band-bucket candidate pairs
    time("minhash_fast_pairs") {
      val sh = Tables.documents(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
      MinHashLsh.candidatePairs(
        MinHashLsh.signaturesFast(sh, "doc_id", 8), "doc_id", 8, 4)
    }

    // scalable dedup pipeline in the standard order: exact dedup FIRST
    // (this corpus is 95% exact copies — as web crawls are), then
    // near-dup over the surviving representatives only. Running near-dup
    // before exact dedup would pay quadratic pair cost inside every
    // duplicate cluster for pairs exact dedup removes for free.
    time("ngram_scalable_pairs") {
      val docs = Tables.documents(spark, dir)
      val reps = docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .join(docs, Seq("doc_id"))
      val sh = reps
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
      NgramDedup.scalablePairs(sh, "doc_id", 0.8, maxDf = 40)
    }
    // cluster consolidation over the scalable near-dup pairs: the
    // pairs→components→representatives tail of the dedup pipeline
    time("dedup_clusters_cc") {
      val docs = Tables.documents(spark, dir)
      val reps = docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .join(docs, Seq("doc_id"))
      val sh = reps
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
      val pairs = NgramDedup.scalablePairs(sh, "doc_id", 0.8, maxDf = 40)
      DedupClusters.connectedComponents(pairs, "id_a", "id_b")
    }
    time("ann_topk_lsh") {
      val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      AnnSearch.annTopK(vecs, vecs.filter(col("vec_id") % 1000 === 0),
        "vec_id", dims = 64, k = 5)
    }
    time("mm_batched_decode") {
      val media = graft.multimodal.MultimodalPipeline.asMediaTable(
        Tables.documents(spark, dir))
      graft.multimodal.MultimodalPipeline.decodeAudio(media)
        .unionByName(graft.multimodal.MultimodalPipeline.decodeVideo(media)
          .selectExpr("media_id", "n_bytes", "duration_ms"), allowMissingColumns = true)
    }
    time("ivf_topk") {
      val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      IvfSearch.ivfTopK(vecs, vecs.filter(col("vec_id") % 1000 === 0),
        "vec_id", k = 5)
    }
    // memory-bounded variant: inverted lists carry 16-byte PQ codes
    // instead of 256-byte float arrays; exact re-rank on the shortlist
    time("ivfpq_topk") {
      val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      IvfPq.ivfPqTopK(vecs, vecs.filter(col("vec_id") % 1000 === 0),
        "vec_id", k = 5)
    }
    // the serving lifecycle: pay training + encoding ONCE (build), then
    // query the stored artifacts — the per-query cost is what a serving
    // user amortizes; compare ivf_index_topk against ivfpq_topk above
    // (which re-trains and re-encodes inside the call)
    scenario("ivf_index") {
      val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      val ipath = s"$dir/ivf-index"
      val t0 = System.nanoTime()
      IvfIndex.build(vecs, "vec_id", ipath)
      val t1 = System.nanoTime()
      val idx = IvfIndex.load(spark, ipath)
      idx.topK(vecs.filter(col("vec_id") % 1000 === 0), "vec_id", k = 5)
        .write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"STRESS ivf_index_build              ${(t1 - t0) / 1e9}%8.2f s")
      println(f"STRESS ivf_index_topk               ${(t2 - t1) / 1e9}%8.2f s")
    }
    // the single-call curation pipeline (exact -> near-dup -> CC -> keepers)
    time("dedup_pipeline") {
      DedupPipeline.dedup(Tables.documents(spark, dir).select("doc_id", "text"),
        threshold = 0.8, maxDf = 40)
    }
    // benchmark decontamination: bench side = every 50th doc
    time("contamination") {
      val docs = Tables.documents(spark, dir)
      Contamination.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("bench_id"), col("text")))
    }
    // round-3 additions — corpus-frequency curation (the tf join is the
    // scale-sensitive piece: every token occurrence shuffles once on the
    // token key, pre-reduced map-side) and the new B-shapes whose scalar
    // predicates are exact integer inequalities
    time("quality_gopher")(QualityOps.qualityGopher(spark, dir))
    time("text_ngram_topk")(QualityOps.textNgramTopk(spark, dir))
    time("text_zipf")(QualityOps.textZipf(spark, dir))
    time("text_rare_ratio")(CurationOps.textRareRatio(spark, dir))
    time("q7_volume")(ShapeQueries2.q7Volume(spark, dir))
    time("q13_distribution")(ShapeQueries2.q13Distribution(spark, dir))
    time("q17_avg_qty")(ShapeQueries2.q17AvgQty(spark, dir))
    time("q22_global_acct")(ShapeQueries2.q22GlobalAcct(spark, dir))

    // round-5 additions: the Q21 triple self-correlation (three same-key
    // shuffles of a 3-column fact projection), and the percentile pair —
    // exact per-group value buffering vs the bounded GK sketch
    time("q21_wait_sole")(ShapeQueries3.q21WaitSole(spark, dir))
    time("agg_percentiles_exact")(ExtendedQueries.aggPercentiles(spark, dir))
    time("agg_percentiles_approx")(ExtendedQueries.aggPercentilesApprox(spark, dir))
    // embedding near-dup pairs at scale: identical-vector families (95%
    // of this corpus, as of web crawls) collapse via exact dedup FIRST —
    // the DedupPipeline convention — else every LSH bucket pays quadratic
    // pair cost inside each family of copies
    time("lsh_neardup_pairs") {
      val e = Tables.embeddings(spark, dir)
      val reps = e.groupBy(xxhash64(col("embedding")).as("h"))
        .agg(min(col("vec_id")).as("vec_id"))
        .join(e, Seq("vec_id"))
        .select("vec_id", "embedding")
      Similarity.lshNearDupPairs(reps, "vec_id", dims = 64, threshold = 0.45)
    }
    // incremental embedding near-dup: same first/second split as the
    // text path below — the second refresh sketches only its delta
    // against the stored cells
    scenario("incembed") {
      val state = s"$dir/incembed-state"
      val p = new org.apache.hadoop.fs.Path(state)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      hfs.delete(p, true)
      val e = Tables.embeddings(spark, dir)
      val reps = e.groupBy(xxhash64(col("embedding")).as("h"))
        .agg(min(col("vec_id")).as("vec_id"))
        .join(e, Seq("vec_id"))
        .select("vec_id", "embedding")
      val idRange = reps.agg(min(col("vec_id")), max(col("vec_id"))).head()
      if (idRange.isNullAt(0)) {
        println("STRESS incembed skipped: embeddings table is empty")
      } else {
        val cut = idRange.getLong(0) / 2 + idRange.getLong(1) / 2
        val t0 = System.nanoTime()
        IncrementalEmbedDedup.refresh(spark, reps.filter(col("vec_id") < cut),
          state, threshold = 0.45)
        val t1 = System.nanoTime()
        // the second refresh sees ONLY its delta — old embeddings come
        // from the state's own vector store (self-contained, r8)
        IncrementalEmbedDedup.refresh(spark,
          reps.filter(col("vec_id") >= cut), state, threshold = 0.45)
        val t2 = System.nanoTime()
        println(f"STRESS incembed_first_half          ${(t1 - t0) / 1e9}%8.2f s")
        println(f"STRESS incembed_second_half         ${(t2 - t1) / 1e9}%8.2f s")
      }
    }
    // round-7 training-set assembly ops: chunking is a narrow explode
    // (must scale with corpus size, no shuffle), shard packing rides the
    // distributed prefix sum, centroids partial-aggregate the dim-fanout
    time("text_chunk")(ChunkOps.textChunk(spark, dir))
    time("shard_pack")(ChunkOps.shardPack(spark, dir))
    time("emb_centroid")(ChunkOps.embCentroid(spark, dir))
    // the sink itself: chunk -> pack -> WRITE one parquet file per shard
    // (grouped dirs) and read the summary back off disk — measures write
    // throughput, where shard_pack above measures only the plan
    scenario("training_export") {
      val out = s"$dir/training-shards"
      val t0 = System.nanoTime()
      val summary = TrainingExport.writeShards(
        Tables.documents(spark, dir).select("doc_id", "text"), out)
      val agg = summary.agg(count(lit(1)), sum(col("n_tokens"))).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS training_export              $dt%8.2f s   " +
        s"shards=${agg.getLong(0)} tokens=${agg.getLong(1)}")

      // the trainer-side read of that artifact: a bounded shard slice
      // (an epoch worker's fetch). The point at scale is files-read —
      // both partition levels prune, so a slice reads ~|slice| of the
      // corpus's files, not a listing-then-filter of all of them
      val nShards = agg.getLong(0)
      val slice = math.min(4L, nShards) // a quarter-ish of 50x's ~13
      val t1 = System.nanoTime()
      val rd = TrainingExport.readShards(spark, out, 1L, 1L + slice)
      rd.write.format("noop").mode("overwrite").save()
      val dtr = (System.nanoTime() - t1) / 1e9
      // files the PRUNED scan actually touches (untimed diagnostic):
      // with one file per shard the two-level partition pruning must
      // read |slice| files of the artifact's nShards total. Measured on
      // the pre-repartition scan — input_file_name does not survive an
      // exchange (it reads "" there, silently collapsing the distinct)
      val filesRead = TrainingExport.shardScan(spark, out, 1L, 1L + slice, 1024)
        .select(input_file_name()).distinct().count()
      println(f"STRESS training_read                $dtr%8.2f s   " +
        s"shards=$slice filesRead=$filesRead ofTotal=$nShards")
    }

    // BPE merge training: ONE corpus pass (the word count), then
    // vocabulary-sized rounds — the round cost must not scale with the
    // corpus, only with the vocabulary
    scenario("tokenizer") {
      val t0 = System.nanoTime()
      val merges = TokenizerTrain.learnMerges(
        Tables.documents(spark, dir).select("text"), numMerges = 8)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS tokenizer_train              $dt%8.2f s   merges=${merges.length}")
      // the production engine split: same one corpus pass, rounds on the
      // driver over the collected Zipf-small vocabulary — 8x the merges
      // must not cost 8x the time (the corpus pass dominates)
      val t1 = System.nanoTime()
      val local = TokenizerTrain.learnMergesLocal(
        Tables.documents(spark, dir).select("text"), numMerges = 64)
      val dt1 = (System.nanoTime() - t1) / 1e9
      println(f"STRESS tokenizer_train_local        $dt1%8.2f s   merges=${local.length}")
      // the downstream tensors: frozen vocab -> id streams -> 2048-token
      // packed sequences; the corpus-sized stages are one broadcast
      // encode join + the prefix-sum pack (per-sequence state = seqLen)
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t2 = System.nanoTime()
      val vocab = TokenEncode.buildVocab(docsDf, local)
      val packed = TokenEncode.packSequences(
        TokenEncode.encodeCorpus(docsDf, local, vocab), 2048,
        numPartitions = 64)
      packed.write.format("noop").mode("overwrite").save()
      val dt2 = (System.nanoTime() - t2) / 1e9
      println(f"STRESS token_encode_pack            $dt2%8.2f s   seqs=${packed.count()}")

      // the tensor-side sink: the packed stream as grouped token shards
      // plus the epoch worker's pruned range read — the same
      // write-throughput / files-read story as training_export, on the
      // ids artifact a trainer actually maps epochs over
      val cached = packed.cache()
      val out = s"$dir/token-shards"
      val t3 = System.nanoTime()
      val summ = TrainingExport.writeTokenShards(cached, out,
        seqsPerShard = 1024)
      val aggT = summ.agg(count(lit(1)), sum(col("n_tokens"))).head()
      val dt3 = (System.nanoTime() - t3) / 1e9
      println(f"STRESS token_shard_write            $dt3%8.2f s   " +
        s"shards=${aggT.getLong(0)} tokens=${aggT.getLong(1)}")
      val nTokSh = aggT.getLong(0)
      val tokSlice = math.min(4L, nTokSh)
      val t4 = System.nanoTime()
      TrainingExport.readTokenShards(spark, out, 1L, 1L + tokSlice)
        .write.format("noop").mode("overwrite").save()
      val dt4 = (System.nanoTime() - t4) / 1e9
      // files-read diagnostic on the shared pruned scan, pre-exchange
      // (input_file_name reads "" past a shuffle)
      val tokFiles = TrainingExport
        .prunedScan(spark, out, 1L, 1L + tokSlice, 1024)
        .select(input_file_name()).distinct().count()
      println(f"STRESS token_shard_read             $dt4%8.2f s   " +
        s"shards=$tokSlice filesRead=$tokFiles ofTotal=$nTokSh")
      // the epoch layer: schedule epoch 1's order, fetch the first 4
      // SCHEDULED (scattered, non-contiguous) shards as a worker would
      // — the IN-set pruning must read exactly those shards' files
      val sched = TrainingExport.epochSchedule(spark, nTokSh, epoch = 1L)
        .orderBy(col("position")).limit(4).select("shard_id")
        .collect().map(_.getLong(0)).toSeq
      val t5 = System.nanoTime()
      TrainingExport.readTokenShardsAt(spark, out, sched)
        .write.format("noop").mode("overwrite").save()
      val dt5 = (System.nanoTime() - t5) / 1e9
      val scatFiles = spark.read.parquet(out)
        .filter(col("shard_group").isin(sched.map(_ / 1024).distinct: _*) &&
          col("shard_id").isin(sched: _*))
        .select(input_file_name()).distinct().count()
      println(f"STRESS token_shard_scatter          $dt5%8.2f s   " +
        s"shards=${sched.length} filesRead=$scatFiles ofTotal=$nTokSh")
      cached.unpersist()
    }

    // model-based quality filtering: train the n-gram LM once (one
    // corpus pass into Zipf-bounded count tables), then score the WHOLE
    // corpus through the shuffle-join path (the honest plan when the
    // model outgrows broadcast) — the CCNet-shaped perplexity filter
    scenario("ngram_lm") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t0 = System.nanoTime()
      val model = NgramLm.train(docsDf, order = 3, minCount = 2L)
        .localCheckpoint(true)
      val nGrams = model.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS ngram_lm_train               $dt%8.2f s   grams=$nGrams")
      val t1 = System.nanoTime()
      NgramLm.score(docsDf, model, broadcastModel = false)
        .write.format("noop").mode("overwrite").save()
      val dt1 = (System.nanoTime() - t1) / 1e9
      println(f"STRESS ngram_lm_score               $dt1%8.2f s   docs=${docsDf.count()}")
      // in-session A/B against the fingerprint-keyed path (spec'd
      // bit-identical scores): the delta is per-position gram-string
      // assembly + string-keyed join vs precomputed rolling-hash longs
      val t2 = System.nanoTime()
      val modelFp = NgramLm.trainFp(docsDf, order = 3, minCount = 2L)
        .localCheckpoint(true)
      val nFp = modelFp.count()
      val dt2 = (System.nanoTime() - t2) / 1e9
      println(f"STRESS ngram_lm_train_fp            $dt2%8.2f s   grams=$nFp")
      val t3 = System.nanoTime()
      NgramLm.scoreFp(docsDf, modelFp, broadcastModel = false)
        .write.format("noop").mode("overwrite").save()
      val dt3 = (System.nanoTime() - t3) / 1e9
      println(f"STRESS ngram_lm_score_fp            $dt3%8.2f s   docs=${docsDf.count()}")
    }

    // cross-doc span duplication at 50x: the stress corpus IS ~50
    // copies of each document, so essentially every span is flagged —
    // the worst case for the flagged-window join and per-doc union fold
    scenario("span_dup") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t0 = System.nanoTime()
      val s = SpanDup.spanDupStats(docsDf, window = 50)
        .agg(count(lit(1)), sum(col("dup_windows")),
          avg(col("dup_fraction"))).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS span_dup_stats               $dt%8.2f s   " +
        f"docs=${s.getLong(0)} dupWindows=${s.getLong(1)} avgFrac=${s.getDouble(2)}%.3f")
      // in-session A/B of the two fingerprint paths: the default above
      // is the O(1)/position rolling hash; this is the O(window)/
      // position joined-xxhash64 path — same flagged sets (spec'd),
      // the delta is pure fingerprint cost at window 50
      val tj = System.nanoTime()
      val sj = SpanDup.spanDupStats(docsDf, window = 50, rolling = false)
        .agg(sum(col("dup_windows"))).head()
      val dtj = (System.nanoTime() - tj) / 1e9
      println(f"STRESS span_dup_stats_joinedfp      $dtj%8.2f s   " +
        s"dupWindows=${sj.getLong(0)}")
      // the removal half on the same worst case: nearly every >=50-word
      // doc is a non-keeper copy, so almost all coverage excises
      val t1 = System.nanoTime()
      val d2 = SpanDup.spanDedup(docsDf, window = 50)
        .agg(sum(col("n_tokens")), sum(col("removed_tokens"))).head()
      val dt1 = (System.nanoTime() - t1) / 1e9
      println(f"STRESS span_dedup                   $dt1%8.2f s   " +
        s"kept=${d2.getLong(0)} removed=${d2.getLong(1)}")
    }

    // incremental dedup: first refresh pays for its batch; the second
    // must pay only for its delta against the stored index
    scenario("incdedup") {
      val state = s"$dir/incdedup-state"
      val p = new org.apache.hadoop.fs.Path(state)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      hfs.delete(p, true)
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      // median of the actual id range, so the first batch is non-empty
      // even at mult=1 (the old (mult/2)*shift was 0 there, making the
      // first refresh a no-op and the timing comparison meaningless)
      val idRange = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
      // min/max aggregates return NULL on an empty table — guard, don't NPE
      if (idRange.isNullAt(0)) {
        println("STRESS incdedup skipped: documents table is empty")
      } else {
        val cut = idRange.getLong(0) / 2 + idRange.getLong(1) / 2
        val t0 = System.nanoTime()
        IncrementalDedup.refresh(spark, docs.filter(col("doc_id") < cut),
          state, threshold = 0.8, maxDf = 40)
        val t1 = System.nanoTime()
        IncrementalDedup.refresh(spark, docs, state, threshold = 0.8, maxDf = 40)
        val t2 = System.nanoTime()
        println(f"STRESS incdedup_first_half          ${(t1 - t0) / 1e9}%8.2f s")
        println(f"STRESS incdedup_second_half         ${(t2 - t1) / 1e9}%8.2f s")
      }
    }

    // learned quality classifier: ONE corpus pass into the dim-bounded
    // count table, then the whole corpus scored through the shuffle-join
    // path (the honest plan when the model outgrows broadcast). The
    // label is mechanical (id parity) — this measures the plan, the
    // separation property is spec'd on constructed labels
    scenario("quality_clf") {
      val docsDf = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"),
          (col("doc_id") % 2 === 0).as("label"))
      val t0 = System.nanoTime()
      val model = QualityClassifier.train(docsDf, dim = 1 << 18)
        .localCheckpoint(true)
      val nFeat = model.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS quality_clf_train            $dt%8.2f s   features=$nFeat")
      val t1 = System.nanoTime()
      QualityClassifier.paretoKeep(
          QualityClassifier.score(docsDf, model, broadcastModel = false))
        .write.format("noop").mode("overwrite").save()
      val dt1 = (System.nanoTime() - t1) / 1e9
      println(f"STRESS quality_clf_score            $dt1%8.2f s   docs=${docsDf.count()}")
    }

    // whole-document packing: the boundary-respecting pack over the 50x
    // corpus — rank + bounded-group fold + prefix + assemble; per-task
    // state never exceeds a group's (rank, len) list / one sequence
    scenario("pack_whole") {
      // mechanical word-hash encoding: real document lengths without
      // paying a BPE encode — packing cost depends only on lengths
      val encoded = Tables.documents(spark, dir)
        .select(col("doc_id"),
          expr("transform(filter(split(text, ' '), w -> length(w) > 0), " +
            "w -> pmod(xxhash64(w), 50000L))").as("ids"))
      val t0 = System.nanoTime()
      val packed = PackWhole.packSequencesWhole(encoded, 2048,
        numPartitions = 64)
      packed.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val agg = packed.agg(count(lit(1)), sum(col("n_tokens")),
        avg(col("n_tokens"))).head()
      println(f"STRESS pack_whole                   $dt%8.2f s   " +
        f"seqs=${agg.getLong(0)} tokens=${agg.getLong(1)} fill=${agg.getDouble(2) / 2048}%.3f")
    }
    // round-10 curation additions on the 50x worst case. line_dedup:
    // word-per-line makes every line cross-doc boilerplate (the corpus
    // is ~50 copies of everything) — maximal flagged-join and rebuild
    // load. sem_dedup: every vector has ~50 exact copies, so ~49/50 of
    // each cluster prunes — maximal within-cluster pair yield.
    // importance_resample: whole-corpus weighing via the shuffle-join
    // path plus the Gumbel top-k.
    scenario("line_dedup") {
      val docsDf = Tables.documents(spark, dir)
        .select(col("doc_id"), regexp_replace(col("text"), " ", "\n").as("text"))
      val t0 = System.nanoTime()
      val ld = LineDedup.dedupLines(docsDf, minDocs = 3L)
        .agg(sum(col("n_lines")), sum(col("removed_lines"))).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS line_dedup                   $dt%8.2f s   " +
        s"kept=${ld.getLong(0)} removed=${ld.getLong(1)}")
    }
    scenario("sem_dedup") {
      val vecsDf = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      val t0 = System.nanoTime()
      val sd = SemDedup.semDedup(vecsDf, threshold = 0.99, id = "vec_id")
        .agg(count(lit(1)), count(when(col("keep"), lit(1)))).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS sem_dedup                    $dt%8.2f s   " +
        s"rows=${sd.getLong(0)} kept=${sd.getLong(1)}")
    }
    scenario("embed_contamination") {
      val vecsDf = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      val dims = vecsDf.head().getSeq[Float](1).length
      val bench = vecsDf.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("bench_id"), col("embedding"))
      // planesPerTable grows with the corpus (the lshNearDupPairs
      // guidance): 4 planes = 16 buckets degenerates to ~300M candidate
      // pairs at 100k vectors (measured 291 s); 16 planes = 65k buckets
      // keeps cells sparse, and the r11 recall-governed auto-tables
      // derive ~22 tables for miss <= 1e-6 at the 0.99 threshold
      val t0 = System.nanoTime()
      val ec = Contamination.embedContamination(vecsDf, bench, 0.99, dims,
        idCol = "vec_id", planesPerTable = 16)
      ec.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS embed_contamination          $dt%8.2f s   " +
        s"flagged=${ec.count()}")
    }
    scenario("importance") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t0 = System.nanoTime()
      val model = ImportanceResample.train(
          docsDf.filter(col("doc_id") % 2 === 0),
          docsDf.filter(col("doc_id") % 2 === 1))
        .localCheckpoint(true)
      val nFeat = model.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS importance_train             $dt%8.2f s   features=$nFeat")
      val t1 = System.nanoTime()
      val sel = ImportanceResample.resample(docsDf, model, 10000,
        broadcastModel = false)
      sel.write.format("noop").mode("overwrite").save()
      val dt1 = (System.nanoTime() - t1) / 1e9
      println(f"STRESS importance_resample          $dt1%8.2f s   k=${sel.count()}")
    }

    // r11: exact whole-span occurrence counts on the same worst case
    // as span_dup_stats — ~every window flagged, so the second keyed
    // pass (first-window candidates + content-hash verify) runs at its
    // maximal load
    scenario("span_dup_spans_exact") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t0 = System.nanoTime()
      val s = SpanDup.spanDupSpansExact(docsDf, window = 50)
        .agg(count(lit(1)), sum(col("occurrences"))).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS span_dup_spans_exact         $dt%8.2f s   " +
        s"spans=${s.getLong(0)} occSum=${s.getLong(1)}")
    }

    // r11: the Gopher repetition suite — thirteen signals over all
    // 250k docs in ONE narrow projection (no shuffle); the 50x corpus
    // maximizes duplicated-gram coverage, so the interval folds run at
    // full load
    scenario("gopher_repetition") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t0 = System.nanoTime()
      val rep = GopherRepetition.repetitionFlags(docsDf)
      rep.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val s = rep.agg(avg(col("dup_5gram_char_frac")),
        sum(when(col("pass_repetition"), 1L).otherwise(0L))).head()
      println(f"STRESS gopher_repetition            $dt%8.2f s   " +
        f"avg5g=${s.getDouble(0)}%.3f pass=${s.getLong(1)}")
    }

    // r11: C4 line+page rules on the word-per-line-ified corpus — the
    // worst case for the line fold (13.5M one-word lines, every line
    // fails the word-count rule, every page fails closed)
    scenario("c4_filter") {
      val docsDf = Tables.documents(spark, dir)
        .select(col("doc_id"), translate(col("text"), " ", "\n").as("text"))
      val t0 = System.nanoTime()
      val c4 = C4Filters.c4Clean(docsDf, blocklist = Seq("blockedword"))
      c4.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val s = c4.agg(sum(col("n_lines")), sum(col("n_lines_kept")),
        sum(when(col("keep"), 1L).otherwise(0L))).head()
      println(f"STRESS c4_filter                    $dt%8.2f s   " +
        s"lines=${s.getLong(0)} kept=${s.getLong(1)} pages=${s.getLong(2)}")
    }

    // r11: unigram-LM tokenizer — one corpus word-count pass + driver
    // EM over the Zipf-small vocabulary (the learnMergesLocal engine
    // split), then the full corpus Viterbi-tokenized through the
    // broadcast word join
    scenario("unigram") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t0 = System.nanoTime()
      val model = UnigramTokenizer.train(docsDf, vocabSize = 2000)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS unigram_train                $dt%8.2f s   " +
        s"pieces=${model.pieces.length}")
      val t1 = System.nanoTime()
      val toks = UnigramTokenizer.tokenizeCorpus(docsDf, model)
      toks.write.format("noop").mode("overwrite").save()
      val dt1 = (System.nanoTime() - t1) / 1e9
      val nTok = toks.agg(sum(col("n_tokens"))).head().getLong(0)
      println(f"STRESS unigram_encode               $dt1%8.2f s   tokens=$nTok")
    }

    // r11: chunked LM scoring — the book-length composition path; at
    // chunkTokens 32 every ~54-word doc splits into two chunks, so the
    // chunk plan + per-chunk score + exact per-doc re-aggregation all
    // carry the full corpus
    scenario("ngram_lm_score_chunked") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val model = NgramLm.train(docsDf, order = 3, minCount = 2)
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val scored = NgramLm.scoreChunked(docsDf, model, chunkTokens = 32,
        broadcastModel = false)
      scored.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS ngram_lm_score_chunked       $dt%8.2f s   " +
        s"docs=${scored.count()}")
    }
    // r11 session 2: split + holdout decontamination on the 95%-dup
    // corpus — the WORST case for the leak check: every document's ~50
    // copies straddle the 80/10/10 boundary, so nearly every train doc
    // genuinely leaks the holdout and the un-broadcast shingle join
    // carries the full flagged fan
    scenario("splits_clean") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t0 = System.nanoTime()
      val cleaned = Splits.assignSplitClean(docsDf,
        Seq("train" -> 800, "valid" -> 100, "test" -> 100))
      cleaned.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val s = cleaned.agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)),
        sum(when(col("leaks_holdout"), 1L).otherwise(0L))).head()
      println(f"STRESS splits_clean                 $dt%8.2f s   " +
        s"train=${s.getLong(0)} leaks=${s.getLong(1)}")
    }

    // r11 session 2: URL gate over synthesized per-doc URLs — row-local
    // parse + three broadcast list joins + one verdict join-back
    scenario("url_filter") {
      val urls = Tables.documents(spark, dir)
        .select(col("doc_id"),
          concat(lit("https://sub."), col("source"), lit(".example.com/page/"),
            col("doc_id").cast("string"), lit("?q=cheap-pills")).as("url"))
      import spark.implicits._
      val block = Seq("src3.example.com", "src7.example.com").toDF("domain")
      val allow = Seq("src7.example.com").toDF("domain")
      val words = Seq(("pills", 0.5), ("casino", 0.7)).toDF("word", "weight")
      val t0 = System.nanoTime()
      val gated = UrlFilters.filterUrls(urls, block, words, allow)
      gated.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val s = gated.agg(sum(when(col("keep"), 1L).otherwise(0L)),
        sum(when(col("blocked_domain").isNotNull, 1L).otherwise(0L))).head()
      println(f"STRESS url_filter                   $dt%8.2f s   " +
        s"kept=${s.getLong(0)} domainBlocked=${s.getLong(1)}")
    }

    // r11 session 2: the dataset card — three rule-family passes (incl.
    // the 13-signal repetition projection) + the volume/HLL pass, all
    // collapsing to per-source rows map-side
    scenario("corpus_report") {
      val docsDf = Tables.documents(spark, dir)
        .select("doc_id", "text", "source")
      val t0 = System.nanoTime()
      val card = CorpusReport.report(docsDf)
      val rows = card.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      val tot = rows.find(_.getString(0) == CorpusReport.TotalRow).get
      println(f"STRESS corpus_report                $dt%8.2f s   " +
        f"sources=${rows.length - 1} docs=${tot.getLong(1)} " +
        f"dupEst=${tot.getDouble(6)}%.3f")
    }

    // r11 session 2: whole-doc pack A/B — next-fit vs best-fit-
    // decreasing at seqLen 512 over the 250k-doc corpus (ids
    // synthesized from token counts; lengths are what packing sees).
    // The delta is packing quality (fewer padded sequences) vs the
    // extra per-step bin scan
    scenario("pack_whole_fit") {
      val encoded = Tables.documents(spark, dir)
        .select(col("doc_id"),
          expr("transform(sequence(1, size(filter(split(text, ' '), " +
            "w -> length(w) > 0))), i -> CAST(i + 1 AS BIGINT))").as("ids"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val nf = PackWhole.packSequencesWhole(encoded, 512)
      nf.write.format("noop").mode("overwrite").save()
      val dt0 = (System.nanoTime() - t0) / 1e9
      val nfn = nf.count()
      println(f"STRESS pack_whole_nextfit           $dt0%8.2f s   seqs=$nfn")
      val t1 = System.nanoTime()
      val bf = PackWhole.packSequencesWhole(encoded, 512, strategy = "bestfit")
      bf.write.format("noop").mode("overwrite").save()
      val dt1 = (System.nanoTime() - t1) / 1e9
      val bfn = bf.count()
      println(f"STRESS pack_whole_bestfit           $dt1%8.2f s   seqs=$bfn")
    }

    // r11 session 5: sparse retrieval lifecycle — postings build, the
    // durable bucketed save, then the same query transient vs served
    // (the served form must win on wall-clock the way ivf_index does:
    // it reads only the query terms' bucket partitions)
    scenario("bm25") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t0 = System.nanoTime()
      val idx = Bm25.buildIndex(docsDf)
      idx.postings.write.format("noop").mode("overwrite").save()
      val dt0 = (System.nanoTime() - t0) / 1e9
      println(f"STRESS bm25_build                   $dt0%8.2f s   " +
        s"docs=${idx.nDocs} avgdl=${idx.avgdl.round}")
      val path = s"$dir/bm25_idx"
      val t1 = System.nanoTime()
      Bm25.save(idx, path)
      val dt1 = (System.nanoTime() - t1) / 1e9
      println(f"STRESS bm25_save                    $dt1%8.2f s")
      val q = Seq("table", "window", "hash", "merge", "vector")
      val t2 = System.nanoTime()
      val tr = Bm25.topK(idx, q, 100)
      tr.write.format("noop").mode("overwrite").save()
      val dt2 = (System.nanoTime() - t2) / 1e9
      println(f"STRESS bm25_topk_transient          $dt2%8.2f s   rows=${tr.count()}")
      val t3 = System.nanoTime()
      val sv = Bm25.topKAt(spark, path, q, 100)
      sv.write.format("noop").mode("overwrite").save()
      val dt3 = (System.nanoTime() - t3) / 1e9
      println(f"STRESS bm25_topk_served             $dt3%8.2f s   rows=${sv.count()}")
    }

    // r11 session 5: hashed TF-IDF vectors (one explode + two keyed
    // aggs + the ≤dim-row idf broadcast) and the model-free semantic
    // dedup they unlock — the whole D-stack on plain text, no encoder
    scenario("tfidf") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t0 = System.nanoTime()
      val v = TfidfVectors.vectorize(docsDf)
      v.write.format("noop").mode("overwrite").save()
      val dt0 = (System.nanoTime() - t0) / 1e9
      println(f"STRESS tfidf_vectorize              $dt0%8.2f s   rows=${v.count()}")
      val t1 = System.nanoTime()
      val dd = TfidfVectors.semDedupText(docsDf, threshold = 0.95)
      val kept = dd.agg(sum(when(col("keep"), 1L).otherwise(0L))).head().getLong(0)
      val dt1 = (System.nanoTime() - t1) / 1e9
      println(f"STRESS tfidf_semdedup               $dt1%8.2f s   kept=$kept")
    }

    // r11 session 6: the pipeline-order form of the above. The raw-form
    // measurement is the DEGENERATE regime by construction: this corpus
    // is 95% exact copies, identical texts make IDENTICAL tf-idf
    // vectors, and the within-cluster pair search pays quadratic cost
    // over identical-vector groups (620 s measured at 50×). The
    // published order (and DedupPipeline.curate's) runs the O(corpus)
    // exact tier FIRST; the semantic tier then pays only for real
    // near-dup structure over the representatives.
    scenario("tfidf_postexact") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t0 = System.nanoTime()
      // localCheckpoint: the representatives feed the vectorize chain's
      // several actions (count, kmeans sample, assignment) — the
      // DedupPipeline.curate lineage convention, or the 250k-doc exact
      // groupBy recomputes per action
      val reps = docsDf
        .groupBy(xxhash64(col("text")).as("_k"))
        .agg(min(col("doc_id")).as("doc_id"),
          first(col("text")).as("text"))
        .drop("_k")
        .localCheckpoint()
      val dd = TfidfVectors.semDedupText(reps, threshold = 0.95)
      val kept = dd.agg(sum(when(col("keep"), 1L).otherwise(0L))).head().getLong(0)
      val dt0 = (System.nanoTime() - t0) / 1e9
      println(f"STRESS tfidf_semdedup_postexact     $dt0%8.2f s   " +
        s"reps=${reps.count()} kept=$kept")
    }

    // r11 session 6: encoding repair at corpus scale. The real corpus is
    // pure ASCII (the fast path — the dominant 100 TB regime), so two
    // measurements: the fast-path scan as-is, then a worst-case corpus
    // where half the docs carry injected mojibake (accents minted via
    // translate, then the UTF-8→Latin-1 mis-decode done with Spark's own
    // encode/decode — the same corruption the expression reverses)
    scenario("text_repair") {
      val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
      val t0 = System.nanoTime()
      val clean = TextRepair.fixEncoding(docsDf)
      clean.write.format("noop").mode("overwrite").save()
      val dt0 = (System.nanoTime() - t0) / 1e9
      val nClean = clean.filter(col("was_mojibake")).count()
      println(f"STRESS text_repair_ascii            $dt0%8.2f s   repaired=$nClean")
      val corrupted = docsDf.withColumn("text",
        when(col("doc_id") % 2 === 0,
          decode(encode(translate(col("text"), "ae", "éè"), "UTF-8"),
            "ISO-8859-1"))
          .otherwise(col("text")))
      val t1 = System.nanoTime()
      val rep = TextRepair.fixEncoding(corrupted)
      rep.write.format("noop").mode("overwrite").save()
      val dt1 = (System.nanoTime() - t1) / 1e9
      val nRep = rep.filter(col("was_mojibake")).count()
      println(f"STRESS text_repair_mojibake         $dt1%8.2f s   repaired=$nRep")
    }

    // G22 drift: two corpus-scale populations through one histogram
    // groupBy each + the bins-sized summary fold — the scale claim is
    // "each side pays one map-side-combinable scan, nothing else grows"
    scenario("drift") {
      val ev = Tables.events(spark, dir)
      val edges = (0 to 10).map(_ * 50.0)
      val t0 = System.nanoTime()
      val s = DriftMonitor.driftSummary(DriftMonitor.numericDrift(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") =!= "view"), "value", edges)).collect()
      val dt0 = (System.nanoTime() - t0) / 1e9
      println(f"STRESS drift_numeric                $dt0%8.2f s   psi=${s.head.getAs[Double]("psi")}%.4f n=${s.head.getAs[Long]("n_ref") + s.head.getAs[Long]("n_cur")}")
      val t1 = System.nanoTime()
      val c = DriftMonitor.driftSummary(DriftMonitor.categoricalDrift(
        ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1), "event_type")).collect()
      val dt1 = (System.nanoTime() - t1) / 1e9
      println(f"STRESS drift_categorical            $dt1%8.2f s   psi=${c.head.getAs[Double]("psi")}%.6f")
    }

    // G24 diff: full corpus vs a 5%-edited refresh — exact mode carries
    // document text through the shuffle, hash mode carries 8 bytes; the
    // A/B quantifies what the byHash trade buys at scale
    scenario("snapshot_diff") {
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      val cur = docs.filter(col("doc_id") % 19 =!= 0)
        .withColumn("text", when(col("doc_id") % 20 === 0,
          concat(col("text"), lit(" [rev]"))).otherwise(col("text")))
      time("snapdiff_exact")(SnapshotDiff.diff(docs, cur, "doc_id"))
      time("snapdiff_hashed")(
        SnapshotDiff.diff(docs, cur, "doc_id", byHash = true))
    }

    // G25: two count-banded exact quantile rounds over the full events
    // table (5 groups) + the row-level flag join
    scenario("robust_outliers") {
      val ev = Tables.events(spark, dir)
      val t0 = System.nanoTime()
      val flags = RobustStats.outliers(ev, "event_type", "value")
      flags.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val nOut = flags.filter(col("is_outlier")).count()
      println(f"STRESS robust_outliers              $dt%8.2f s   flagged=$nOut")
    }

    // G27 record linkage: a 550k-record synthetic dirty roster (10%
    // planted one-char-off duplicates), blocking into ~110-record
    // blocks — ~30M candidate pairs through the row-local edit-
    // similarity scorer, then CC over the matched edges
    scenario("record_link") {
      val base = spark.range(500000L).select(col("id"),
        concat(lit("rec_"), col("id"), lit("_"),
          substring(md5(col("id").cast("string")), 1, 6)).as("name"),
        (col("id") % 5000).as("block"),
        (col("id") % 7).cast("string").as("seg"))
      val dupes = base.filter(col("id") % 10 === 0)
        .select((col("id") + 10000000L).as("id"),
          concat(lit("xec_"), expr("substring(name, 5)")).as("name"),
          col("block"), col("seg"))
      val roster = base.unionByName(dupes)
      val t0 = System.nanoTime()
      val linked = RecordLinkage.link(roster, "id", Seq(col("block")),
        Seq(RecordLinkage.Fuzzy("name", 0.75), RecordLinkage.Exact("seg", 0.25)),
        threshold = 0.9, maxBlockSize = 200)
      linked.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val merged = linked.filter(!col("keep")).count()
      println(f"STRESS record_link                  $dt%8.2f s   merged=$merged")
    }

    // F4 real video decode: row-local batched AVI parse + frame stats
    // over thousands of clips (one ~8-frame raw-DIB template replicated
    // with distinct ids — decode cost is per-row, payload content
    // identical, which is exactly what a throughput probe wants)
    scenario("video_decode") {
      def u32le(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def u16le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def fcc(s: String) = s.getBytes("US-ASCII")
      def chunk(id: String, d: Array[Byte]) = fcc(id) ++ u32le(d.length.toLong) ++
        d ++ (if (d.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
      def list(t: String, subs: Array[Byte]*) = chunk("LIST", fcc(t) ++ subs.flatten)
      val (w, h, nf) = (64, 64, 8)
      val frame = {
        val stride = (w * 3 + 3) & ~3
        val px = new Array[Byte](stride * h)
        var i = 0; while (i < px.length) { px(i) = (i % 251).toByte; i += 1 }
        px
      }
      val avih = u32le(40000) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
        u32le(nf.toLong) ++ u32le(0) ++ u32le(1) ++ u32le(0) ++
        u32le(w.toLong) ++ u32le(h.toLong) ++ Array.fill(16)(0.toByte)
      val strh = fcc("vids") ++ fcc("DIB ") ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
        u32le(1) ++ u32le(25) ++ u32le(0) ++ u32le(nf.toLong) ++ u32le(0) ++
        u32le(0) ++ u32le(0) ++ u16le(0) ++ u16le(0) ++ u16le(0) ++ u16le(0)
      val strf = u32le(40) ++ u32le(w.toLong) ++ u32le(h.toLong) ++ u16le(1) ++
        u16le(24) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
        u32le(0) ++ u32le(0)
      val body = fcc("AVI ") ++
        list("hdrl", chunk("avih", avih),
          list("strl", chunk("strh", strh), chunk("strf", strf))) ++
        list("movi", (0 until nf).map(_ => chunk("00db", frame)): _*)
      val avi = fcc("RIFF") ++ u32le(body.length.toLong) ++ body
      val clips = 4000
      val media = spark.range(clips.toLong)
        .select(col("id").as("media_id"), lit(avi).as("payload"),
          lit("video/avi").as("media_type"))
        .repartition(64)
      val t0 = System.nanoTime()
      val dec = graft.multimodal.MultimodalPipeline.decodeVideo(media)
      dec.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val mb = avi.length.toLong * clips / (1 << 20)
      println(f"STRESS video_decode                 $dt%8.2f s   clips=$clips bytes=${mb}MiB")
    }
    // E39 similarity-ordered packing: cluster-bounded greedy chains
    // over the blown-up embeddings — the quadratic is per-cluster and
    // the cluster count scales out, so wall-clock tracks n·k, not n²
    scenario("context_order") {
      val vecs = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding"))
      time("context_order")(
        graft.operators.ContextOrder.order(vecs))
    }

    // G29 staged curation: the 3-stage chain over the blown-up corpus,
    // fresh (every stage computed + committed) then resumed (every
    // stage reused off its marker) — the measured gap is what
    // checkpoint-resume saves when a 100 TB pipeline dies at stage N
    scenario("curation_run") {
      import graft.operators.CurationRun
      import graft.operators.CurationRun.Stage
      val wd = s"$dir/curation_run_wd"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wd))
      val docs = Tables.documents(spark, dir)
      val stages = Seq(
        Stage("len_gate", _.filter(length(col("text")) >= 200)),
        Stage("quality_gate", df => df.join(
          QualityOps.qualityFlags(df).filter(col("pass")).select("doc_id"),
          Seq("doc_id"), "left_semi")),
        Stage("exact_dedup", _.withColumn("text_hash", md5(col("text")))
          .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
            .Window.partitionBy("text_hash").orderBy("doc_id")))
          .filter(col("rn") === 1).drop("rn", "text_hash")))
      val t0 = System.nanoTime()
      val (_, r1) = CurationRun.run(spark, docs, stages, wd)
      val fresh = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val (_, r2) = CurationRun.run(spark, docs, stages, wd)
      val resumed = (System.nanoTime() - t1) / 1e9
      require(r2.forall(_.reused), "resume must reuse every stage")
      println(f"STRESS curation_run                 $fresh%8.2f s   resume=$resumed%.2f s stages=${r1.map(s => s"${s.stage}:${s.rowsOut}").mkString(",")}")
    }

    // G28 + Z-order: lay the blown-up lineitem out z-ordered on
    // (l_partkey, l_extendedprice), hoist footer stats into the file
    // index, then run the same selective 2-D box aggregate via the full
    // scan and via the pruned file list — the measured gap is what
    // planning-time skipping buys BEFORE the scan is even scheduled
    // (row-group skipping inside surviving files is on top of this)
    scenario("zorder_skip") {
      import graft.sources.{FileStatsIndex, Layout}
      import graft.sources.FileStatsIndex._
      val zdir = s"$dir/lineitem_z.parquet"
      if (!new java.io.File(zdir).exists()) {
        val t0 = System.nanoTime()
        Layout.writeZOrdered(Tables.lineitem(spark, dir), zdir,
          numFiles = 256, zCols = Seq("l_partkey", "l_extendedprice"))
        println(f"STRESS zorder_write                 ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      val t1 = System.nanoTime()
      val stats = FileStatsIndex.build(spark, zdir,
        Seq("l_partkey", "l_extendedprice"))
      val nFiles = stats.select("file").distinct().count()
      println(f"STRESS zorder_index_build           ${(System.nanoTime() - t1) / 1e9}%8.2f s   files=$nFiles")
      val bounds = Seq(
        LongBound("l_partkey", Some(1000L), Some(3000L)),
        DoubleBound("l_extendedprice", None, Some(5000.0)))
      val pred = col("l_partkey").between(1000L, 3000L) &&
        col("l_extendedprice") <= 5000.0
      def agg(df: DataFrame) = df.filter(pred)
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
      // three rungs: naive layout (no skipping anywhere), z layout full
      // scan (parquet's OWN row-group skipping — the z sort makes every
      // footer's stats tight, so the reader prunes row groups without
      // our index), z layout + file index (file-level skipping BEFORE
      // scheduling — on local NVMe the residual vs rung 2 is scheduling
      // overhead only; on an object store rung 2 still opens every file)
      val t2 = System.nanoTime()
      val naive = agg(Tables.lineitem(spark, dir)).collect().toSeq
      val dtNaive = (System.nanoTime() - t2) / 1e9
      val t2b = System.nanoTime()
      val full = agg(spark.read.parquet(zdir)).collect().toSeq
      val dtFull = (System.nanoTime() - t2b) / 1e9
      val kept = FileStatsIndex.pruneFiles(stats, bounds).count()
      val t3 = System.nanoTime()
      val pruned = agg(FileStatsIndex.readPruned(spark, zdir, stats, bounds))
        .collect().toSeq
      val dtPruned = (System.nanoTime() - t3) / 1e9
      require(full == pruned && naive == pruned,
        s"skipping changed results: $naive / $full vs $pruned")
      println(f"STRESS zorder_skip                  $dtPruned%8.2f s   naive=$dtNaive%.2f s zfull=$dtFull%.2f s kept=$kept/$nFiles")
      // in-place OPTIMIZE on the live dir (idempotent re-z-order):
      // read + rewrite + verify-count + swap + manifest rebuild — the
      // full maintenance op at 30M rows
      val t4 = System.nanoTime()
      val (ob, oa) = Layout.optimizeZOrdered(spark, zdir, numFiles = 256,
        zCols = Seq("l_partkey", "l_extendedprice"),
        statsCols = Seq("l_partkey", "l_extendedprice"))
      val dtOpt = (System.nanoTime() - t4) / 1e9
      println(f"STRESS zorder_optimize              $dtOpt%8.2f s   files=$ob->$oa")
    }
    // r12 MERGE at scale: one 7.5M-entity partition (blown-up order
    // keys), merge 1% corrections — the full generation-commit rewrite
    // (read current gen, anti-join, write, verify, pointer swap, GC)
    scenario("merge_scale") {
      val vs = s"$dir/merge-store"
      val vsDir = new java.io.File(vs)
      if (vsDir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
        rm(vsDir)
      }
      val store = new graft.registry.ParquetValueStore(spark, vs)
      val base = Tables.orders(spark, dir)
        .select(col("o_orderkey").cast("string").as("entity_id"),
          col("o_totalprice").as("value"))
      val rows = base.select(col("entity_id"), col("value"),
        lit(null).cast("string").as("value_str"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
          .as("computed_at"),
        lit("spend").as("feature_name"), lit("v1").as("version"))
      store.append(rows)
      val n = store.read().count()
      val updates = rows.filter(xxhash64(col("entity_id")) % 100 === 0)
        .withColumn("value", -col("value"))
      val nUpd = updates.count()
      val t0 = System.nanoTime()
      store.merge(updates)
      val dt = (System.nanoTime() - t0) / 1e9
      val after = store.read()
      val merged = after
        .agg(count(lit(1)), count(when(col("value") < 0, 1))).head()
      require(merged.getLong(0) == n && merged.getLong(1) == nUpd,
        s"merge changed cardinality: $merged vs ($n, $nUpd)")
      println(f"STRESS merge_scale                  $dt%8.2f s   " +
        s"rows=$n updated=$nUpd gen=${store.currentGeneration("spend", "v1")}")
    }

    // r12 recall-rescue blocking at scale: a 8.25M-record dirty roster
    // (7.5M + 10% typo'd dupes). Sorted-neighborhood = global sort +
    // zipWithIndex + bucketed window join (O(n*w) pairs); q-gram =
    // explode + df-cap + per-gram self-join
    scenario("blocking_scale") {
      // 16-hex-char distinctive names; dupes flip a LATE character so
      // sort adjacency and >= 1 shared q-gram both survive the typo.
      // q=8 per the corpus-sized-q rule (qgramPairs scaladoc): q=6 at
      // this scale measured 820M candidates / 256 s — the documented
      // degenerate regime
      val base = Tables.orders(spark, dir)
        .select(col("o_orderkey").as("id"),
          substring(md5(col("o_orderkey").cast("string")), 1, 16)
            .as("name"))
      val dupes = base.filter(col("id") % 10 === 0)
        .select((col("id") + 1000000000L).as("id"),
          concat(expr("substring(name, 1, 15)"), lit("x")).as("name"))
      val records = base.unionByName(dupes)
      val t0 = System.nanoTime()
      val sn = RecordLinkage.sortedNeighborhoodPairs(
        records, "id", col("name"), window = 8).count()
      val dt0 = (System.nanoTime() - t0) / 1e9
      println(f"STRESS blocking_sortedneigh         $dt0%8.2f s   pairs=$sn")
      val t1 = System.nanoTime()
      val qg = RecordLinkage.qgramPairs(records, "id", "name",
        q = 8, dfCap = 100).count()
      val dt1 = (System.nanoTime() - t1) / 1e9
      println(f"STRESS blocking_qgram               $dt1%8.2f s   pairs=$qg")
    }

    scenario("golden_scale") {
      // survivorship over the 50× order book: ~7.5M records collapsing
      // onto the UNMULTIPLIED 150k-customer entity roster (~50 records
      // per entity) — one label join + the combinable rule aggregate,
      // plus one Mode pass; cardinality-verified against the roster
      val records = Tables.orders(spark, dir)
        .select(col("o_orderkey").as("id"), col("o_custkey"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"),
          col("o_totalprice").as("price"), col("o_orderdate").as("ts"))
      val assign = records.select(col("id"),
        col("o_custkey").as("entity_id"))
      val t0 = System.nanoTime()
      val g = RecordLinkage.goldenRecords(records.drop("o_custkey"), "id",
        assign, Seq(RecordLinkage.Mode("status"),
          RecordLinkage.Longest("prio"),
          RecordLinkage.LatestBy("price", "ts")))
      g.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val n = g.count()
      val entities = records.select(col("o_custkey")).distinct().count()
      println(f"STRESS golden_scale                 $dt%8.2f s   rows=$n (entities=$entities)")
      require(n == entities, s"golden rows $n != entities $entities")
    }

    scenario("table_profile_scale") {
      // melt-shaped profiling of 4 mixed-type columns over the 50×
      // fact: the honest #cols× volume through two keyed shuffles
      // (~30M rows -> ~120M melted entries), exact distincts included
      time("table_profile_scale") {
        TableProfile.profile(Tables.lineitem(spark, dir),
          Seq("l_quantity", "l_returnflag", "l_shipdate", "l_extendedprice"))
      }
    }

    scenario("privacy_scale") {
      // r12 s5: the privacy verbs over the 50× fact. suppress = two
      // keyed shuffles (aggregate + null-safe left-semi) over ~7.5M
      // orders on a (custkey%1000, priority) quasi tuple (~5k groups);
      // pseudonymize = pure row-local codegen sha2 over 30M lineitems
      val orders = Tables.orders(spark, dir)
        .withColumn("cust_bucket", col("o_custkey") % 1000)
      time("privacy_suppress") {
        Privacy.suppress(orders, Seq("cust_bucket", "o_orderpriority"),
          k = 100)
      }
      time("privacy_pseudonymize") {
        Privacy.pseudonymize(Tables.lineitem(spark, dir),
          Seq("l_orderkey", "l_partkey"), salt = "stress")
      }
    }

    scenario("basket_scale") {
      // r12 s5: co-occurrence over the 50× order book — baskets stay
      // <= ~15 items at ANY corpus size (the per-basket quadratic is
      // the bound, not the corpus), so pairs grow linearly with rows
      time("copurchase") {
        BasketOps.copurchasePairs(Tables.lineitem(spark, dir),
          "l_orderkey", "l_partkey", minSupport = 2)
      }
    }

    scenario("keyword_scale") {
      // r12 s5: top-terms over 2.5M documents — explode + two keyed
      // aggregates + the doc-partitioned window (WindowGroupLimit
      // caps the per-doc sort at k)
      time("doc_top_terms") {
        KeywordOps.topTerms(Tables.documents(spark, dir),
          "doc_id", "text", k = 3)
      }
    }

    scenario("corr_scale") {
      // r12 s5: 30M rows sits PAST the exact path's 2^53 bound
      // (n²·var(qty) ≈ 1.9e17) — assert the designed loud refusal
      // (silent rounding would be the bug), then time the double-sum
      // scale path that carries from there
      val units = Tables.lineitem(spark, dir).select(
        floor(col("l_quantity") + 0.5).cast("long").as("qty"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("disc_pct"),
        floor(col("l_tax") * 100 + 0.5).cast("long").as("tax_pct"))
      val cols = Seq("qty", "disc_pct", "tax_pct")
      val refused = try {
        CorrelationOps.corrMatrix(units, cols)
          .write.format("noop").mode("overwrite").save(); false
      } catch { case e: Throwable =>
        def any(t: Throwable): Boolean = t != null &&
          (Option(t.getMessage).exists(_.contains("2^53")) || any(t.getCause))
        any(e)
      }
      require(refused, "corr_exact at 30M rows must refuse loudly")
      println(f"STRESS corr_exact_refusal           ${0.0}%8.2f s   (loud 2^53 refusal as designed)")
      time("corr_fast")(CorrelationOps.corrMatrixFast(units, cols))
    }

    scenario("scd2_scale") {
      // r12 s6: Type-2 history over the 50× event stream — ~5M changes
      // fold through ONE user-keyed window pass (the collapse lag and
      // interval lead share the Exchange+Sort); then the O(delta)
      // claim measured: applyChanges with a 10k-row delta must rebuild
      // only the touched keys, not re-window 5M rows
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      time("scd2_build") {
        Scd2.build(ev, Seq("user_id"), Seq("event_type"), "ts", Seq("event_id"))
      }
      val hist = Scd2.build(ev, Seq("user_id"), Seq("event_type"), "ts",
        Seq("event_id")).localCheckpoint()
      val delta = ev.filter(col("user_id") % 997 === 0)
        .withColumn("ts", col("ts") + expr("INTERVAL 400 DAYS"))
        .limit(10000).localCheckpoint()
      time("scd2_apply_delta") {
        Scd2.applyChanges(hist, delta,
          Seq("user_id"), Seq("event_type"), "ts", Seq("event_id"))
      }
      // r13: the exact-everywhere raw-log verb at the same delta — cost
      // is O(touched keys' raw rows): the semi-join selects ~1/997 of
      // the 50x log, never re-windows the corpus
      time("scd2_apply_log") {
        Scd2.applyLog(ev, hist, delta,
          Seq("user_id"), Seq("event_type"), "ts", Seq("event_id"))
      }
    }

    scenario("regression_scale") {
      // r12 s6: 30M rows sits past the OLS exact path's 2^53 bound on
      // dx ≈ n²·var(qty) — assert the designed loud refusal, then time
      // the double-sum scale path. Welch stays EXACT at 50×: whole-unit
      // event values keep n²·var ≈ 2.5e15 under the guard by design.
      val li = Tables.lineitem(spark, dir).select(
        col("l_returnflag").as("grp"),
        floor(col("l_quantity") + 0.5).cast("long").as("x"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("y"))
      val refused = try {
        RegressionOps.olsTrend(li, "grp", "x", "y")
          .write.format("noop").mode("overwrite").save(); false
      } catch { case e: Throwable =>
        def any(t: Throwable): Boolean = t != null &&
          (Option(t.getMessage).exists(_.contains("2^53")) || any(t.getCause))
        any(e)
      }
      require(refused, "ols exact at 30M rows must refuse loudly")
      println(f"STRESS ols_exact_refusal            ${0.0}%8.2f s   (loud 2^53 refusal as designed)")
      time("regression_ols_fast")(RegressionOps.olsTrendFast(li, "grp", "x", "y"))
      time("regression_welch_exact") {
        RegressionOps.welchTTest(Tables.events(spark, dir).select(
          col("event_type"), floor(col("value") + 0.5).cast("long").as("v")),
          "event_type", "v")
      }
    }

    scenario("fk_audit_scale") {
      // r12 s6: referential audit of the 30M-row fact against the
      // 7.5M-key parent — the child pre-aggregates to distinct keys
      // BEFORE the existence join, so the join carries ~7.5M key rows,
      // not 30M fact rows
      time("fk_audit_50x") {
        IntegrityOps.fkAudit("lineitem->orders",
          Tables.lineitem(spark, dir).select("l_orderkey"), "l_orderkey",
          Tables.orders(spark, dir).select("o_orderkey"), "o_orderkey")
      }
    }

    scenario("corpus_overlap_scale") {
      // r12 s6: exact pairwise containment across sources of 2.5M docs
      // (the distinct (corpus, shingle) projection IS the cost), then
      // the bottom-k sketch pair math — the piece that stays
      // corpus-count-sized however large the corpora get
      val docs = Tables.documents(spark, dir)
      time("corpus_overlap_exact")(CorpusOverlap.exactOverlap(docs, "source", "text"))
      time("corpus_overlap_sketch")(
        CorpusOverlap.overlapSketch(docs, "source", "text", k = 1024))
      val sk = CorpusOverlap.overlapSketch(docs, "source", "text", k = 1024)
        .localCheckpoint()
      time("corpus_overlap_est")(CorpusOverlap.estimateOverlap(sk, k = 1024))
    }

    scenario("ts_interp_scale") {
      // r12 s6: the gap-fill verb at 50× — the corpus-sized part is the
      // daily aggregation; the spine+windows run on the groups×days grid
      time("ts_interp_50x") {
        val daily = Tables.events(spark, dir)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
              .cast("long").as("day_idx"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
          .filter(col("day_idx") % 3 =!= 1)
        TimeSeriesOps.interpolateLinear(daily, "event_type", "day_idx", "cents")
      }
    }

    scenario("pagerank_scale") {
      // r12 s6: 3 exact iterations over the 50× trade graph — edge
      // count grows toward cust×supp saturation (~30M directed edges),
      // each iteration one edge-keyed join + one dst aggregation
      val trade = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"),
          (col("l_suppkey") + 1000000L).as("supp"))
        .distinct()
      val edges = trade.select(col("cust").as("src"), col("supp").as("dst"))
        .unionByName(trade.select(col("supp").as("src"), col("cust").as("dst")))
      time("pagerank_50x")(GraphOps.pagerank(edges, iters = 3))
      // r13: seed-restart ranks on the same graph — identical per-round
      // shape (edge join + dst agg), mass confined to the seeds' basin
      val seeds = Tables.supplier(spark, dir)
        .select((col("s_suppkey") + 1000000L).as("id")).limit(200)
      time("pagerank_ppr_50x")(
        GraphOps.personalizedPagerank(edges, seeds, iters = 3))
      // r13: volume-weighted variant — same per-round shape plus the
      // additive parallel-edge merge; weights = distinct-order counts
      val wtrade = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"),
          (col("l_suppkey") + 1000000L).as("supp"), col("l_orderkey"))
        .distinct()
        .groupBy(col("cust"), col("supp")).agg(count(lit(1)).as("w"))
      val wedges = wtrade
        .select(col("cust").as("src"), col("supp").as("dst"), col("w"))
        .unionByName(wtrade
          .select(col("supp").as("src"), col("cust").as("dst"), col("w")))
      time("pagerank_weighted_50x")(
        GraphOps.pagerankWeighted(wedges, iters = 3))
    }

    scenario("cc_giant") {
      // r14 directive 2: THE boilerplate pathology — ≥90% of all
      // vertices collapse into ONE near-dup component, so the
      // pointer-doubling shortcut join (comp ← comp(comp)) and the
      // final rounds' propagation concentrate on a single comp key.
      // 4M vertices: 3.6M in one giant tree (depth ~21, so several
      // doubling rounds actually run), 400k in 200k two-node comps.
      val v = 4000000L
      val giantN = v * 9 / 10
      val giant = spark.range(1L, giantN)
        .select(col("id").as("a"), (col("id") / 2).cast("long").as("b"))
      val rest = spark.range(giantN, v, 2)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val ccEdges = giant.unionByName(rest).localCheckpoint()
      val t0 = System.nanoTime()
      val labels = DedupClusters.connectedComponents(ccEdges, "a", "b")
        .localCheckpoint()
      val n = labels.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS cc_giant_50x                 $dt%8.2f s   rows=$n")
      val giantSize = labels.filter(col("comp") === 0L).count()
      require(giantSize >= n * 9 / 10,
        s"trial degenerate: giant=$giantSize of $n")
      // A19 measurement the r13 verdict asked for: the concentration
      // of the comp key the shortcut join hashes on at the final round
      val prof = SkewOps.profileKey(labels, "comp", topK = 1).collect()(0)
      println("STRESS cc_giant_profile             comp " +
        s"top_key_n=${prof.getAs[Long]("key_n")} " +
        s"n_rows=${prof.getAs[Long]("n_rows")} " +
        s"n_keys=${prof.getAs[Long]("n_keys")} " +
        f"max_over_mean=${prof.getAs[Double]("max_over_mean")}%.1f")
    }

    scenario("anchor_reliable") {
      // r14 directive 3: the reliable-FS checkpoint seam has only ever
      // run in the bit-identity spec — run a full 50× pagerank under
      // it and record the insurance premium vs Anchor.Local.
      val trade = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"),
          (col("l_suppkey") + 1000000L).as("supp"))
        .distinct()
      val prEdges = trade.select(col("cust").as("src"), col("supp").as("dst"))
        .unionByName(trade.select(col("supp").as("src"), col("cust").as("dst")))
        .localCheckpoint()
      // the asserts below depend on the gated time() runs, so the
      // scenario name must be a PREFIX of every inner name: any ONLY
      // token that enables this body then provably enables the runs
      // that create the state the asserts check
      val ckpt = s"$dir/reliable_ckpt"
      time("anchor_reliable_localbase_50x")(GraphOps.pagerank(prEdges, iters = 3))
      time("anchor_reliable_50x")(
        GraphOps.pagerank(prEdges, iters = 3, anchor = Anchor.Reliable(ckpt)))
      val fsys = new org.apache.hadoop.fs.Path(ckpt)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val summary = fsys.getContentSummary(new org.apache.hadoop.fs.Path(ckpt))
      println(s"STRESS anchor_reliable_ckpt         files=${summary.getFileCount} bytes=${summary.getLength}")
      require(summary.getFileCount > 0,
        "Reliable run left no checkpoint state — the seam did not engage")
      fsys.delete(new org.apache.hadoop.fs.Path(ckpt), true)
      require(!fsys.exists(new org.apache.hadoop.fs.Path(ckpt)))
      println("STRESS anchor_reliable_cleaned      checkpoint dir reclaimed")
    }

    scenario("tpch_tail_scale") {
      // r13: the derived-supply TPC-H tail at 50x — ps is the ONLY
      // lineitem-sized shuffle (map-side combinable (part,supp) MIN);
      // q9 then joins the 30M-row fact against it co-keyed; q20's
      // two-level rollup derives per-part totals from the
      // per-(part,supp) frame, never re-scanning the fact
      time("tpch_tail_q2_50x")(ShapeQueries4.q2MinCost(spark, dir))
      time("tpch_tail_q9_50x")(ShapeQueries4.q9Profit(spark, dir))
      time("tpch_tail_q20_50x")(ShapeQueries4.q20Dominant(spark, dir))
    }

    scenario("supply_mart") {
      // r14 directive 1: materialize ps ONCE (SupplyMart high-water
      // refresh) and point the tier at it — the mart-fed q2/q11 never
      // scan the 30M-row fact, q9 keeps one fact scan but drops the
      // rollup shuffle. Inline twins timed in the same session so the
      // recorded delta is same-JVM, same-cache.
      val mart = s"$dir/supply_mart"
      new org.apache.hadoop.fs.Path(mart)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(mart), true)
      val t0 = System.nanoTime()
      val touched = SupplyMart.refresh(spark,
        Tables.lineitem(spark, dir), mart, buckets = 64).touched
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STRESS supply_mart_refresh_50x       $dt%8.2f s   rows=${SupplyMart.read(spark, mart).count()} (buckets=$touched)")
      val supply = SupplyMart.read(spark, mart)
      time("supply_mart_q2_50x")(ShapeQueries4.q2MinCostFrom(spark, dir, supply))
      time("supply_mart_q9_50x")(ShapeQueries4.q9ProfitFrom(spark, dir, supply))
      time("supply_mart_q11_50x")(ShapeQueries4.q11ImportantFrom(spark, dir, supply))
      time("supply_mart_q2_inline_50x")(ShapeQueries4.q2MinCost(spark, dir))
      time("supply_mart_q9_inline_50x")(ShapeQueries4.q9Profit(spark, dir))
      time("supply_mart_q11_inline_50x")(ShapeQueries4.q11Important(spark, dir))
    }

    scenario("target_encode_scale") {
      // r12 s6b: both supervised encodings over 7.5M orders — one
      // corpus aggregation to a 5-category frame, broadcast join back,
      // row-local LOO projection
      time("target_encode_50x") {
        TargetEncode.encode(Tables.orders(spark, dir).select(
          col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents")),
          "o_orderkey", "o_orderpriority", "cents", m = 20.0)
      }
      time("target_encode_woe_50x") {
        TargetEncode.woe(Tables.orders(spark, dir).select(
          col("o_orderpriority"), (col("o_orderstatus") === "F").as("ful")),
          "o_orderpriority", "ful")
      }
    }

    scenario("triangles_scale") {
      // r12 s6b: the census at 50× NEEDS relative support — absolute
      // support >= 2 saturates the co-purchase graph when every part
      // appears mult× more often (avg degree ~10^3, wedges ~10^11);
      // support >= mult keeps the edge semantics ("co-bought in >= 2
      // base-corpus orders' worth of evidence") and the O(m^1.5) bound
      // honest
      val items = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = items.select(col("o"), col("p").as("pa"))
        .join(items.select(col("o"), col("p").as("pb")), Seq("o"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2L * mult)
        .select(col("pa"), col("pb"))
        .localCheckpoint()
      println(f"STRESS triangles_edges              ${0.0}%8.2f s   rows=${edges.count()} (support >= ${2 * mult})")
      time("triangles_50x")(GraphOps.triangleCount(edges))
    }

    scenario("compress_scale") {
      // r12 s6: deflate 2.5M docs — row-local, rides the scan, the
      // reused-Deflater-per-partition design point
      time("compress_50x") {
        CompressionSignal.score(
          Tables.documents(spark, dir).select("doc_id", "text"), "text")
          .select("doc_id", "n_bytes", "n_compressed", "compress_ratio")
      }
    }

    scenario("audit_cost") {
      // r15 review-wave question quantified: the late-arrival audit
      // adds a footer-metadata log count + a pushed-filter past-mark
      // count per refresh (the shed pass is delta-scale). Measure both
      // refresh flavors on the 30M-row fact, ALTERNATING so neither
      // flavor systematically pays the cold cache (the first
      // measurement of this scenario did exactly that and read as a
      // 2× audit cost; warm it is ~1.5-2 s, the unpartitioned-log
      // worst case where the past-count cannot prune).
      def freshMart(tag: String): String = {
        val m = s"$dir/audit_cost_$tag"
        val p = new org.apache.hadoop.fs.Path(m)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
        m
      }
      for (audit <- Seq(false, true, false, true)) {
        val m = freshMart(s"full_$audit")
        val t0 = System.nanoTime()
        val r = SupplyMart.refresh(spark, Tables.lineitem(spark, dir), m,
          buckets = 64, audit = audit)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"STRESS audit_cost_full_refresh      $dt%8.2f s   audit=$audit touched=${r.touched} late=${r.lateRows}")
      }
      // the steady-state shape: snapshot exists, a thin delta arrives —
      // the audit's log pass is the dominant extra cost here, so this
      // is where the trade actually bites
      val li = Tables.lineitem(spark, dir)
      // l_shipdate is TIMESTAMP_NTZ → LocalDateTime on the driver
      val cutoff = li.select(max(col("l_shipdate"))).head()
        .getAs[java.time.LocalDateTime](0).minusDays(90) // last ~90 days as delta
      for (audit <- Seq(false, true, false, true)) {
        val m = freshMart(s"incr_$audit")
        SupplyMart.refresh(spark, li.filter(col("l_shipdate") <= lit(cutoff)), m,
          buckets = 64, audit = audit): Unit
        val t0 = System.nanoTime()
        val r = SupplyMart.refresh(spark, li, m, buckets = 64, audit = audit)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"STRESS audit_cost_delta_refresh     $dt%8.2f s   audit=$audit touched=${r.touched} shed=${r.replayShedRows} late=${r.lateRows}")
      }
      // the repair verb at 30M rows: seed with only the LAST 90 days
      // (everything older arrives "late"), measure the full repair,
      // then the clean re-run (fingerprint-only — the steady-state
      // cost of running reconcile on a schedule)
      val m = freshMart("reconcile")
      SupplyMart.refresh(spark, li.filter(col("l_shipdate") > lit(cutoff)), m,
        buckets = 64): Unit
      val lateN = SupplyMart.refresh(spark, li, m, buckets = 64).lateRows
      var t0 = System.nanoTime()
      val fixed = SupplyMart.reconcile(spark, li, m)
      println(f"STRESS audit_cost_reconcile         ${(System.nanoTime() - t0) / 1e9}%8.2f s   late=$lateN buckets_rewritten=$fixed")
      t0 = System.nanoTime()
      val clean = SupplyMart.reconcile(spark, li, m)
      println(f"STRESS audit_cost_reconcile_clean   ${(System.nanoTime() - t0) / 1e9}%8.2f s   buckets_rewritten=$clean")
      require(clean == 0, s"clean reconcile rewrote $clean buckets")
      require(SupplyMart.refresh(spark, li, m, buckets = 64).lateRows == 0L,
        "audit not clean after reconcile")
    }

    scenario("streaming_refresh") {
      // r14 directive 7: every streaming component had only spec-scale
      // evidence. Drive StreamingOnlineRefresh with N micro-batches of
      // corrections over the 50× corpus — full merge + generation
      // publish + prune(keep=2) per batch — with a concurrent poller
      // reading throughout; record per-batch publish latency and the
      // generation count pruning leaves behind.
      import spark.implicits._
      import graft.registry.{FeatureDef, FeatureStore, ParquetValueStore, TableDef}
      implicit val sqlCtx = spark.sqlContext
      val sdir = s"$dir/streaming_refresh"
      val spath = new org.apache.hadoop.fs.Path(sdir)
      val fsys = spath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(spath, true)
      val vsf = new ParquetValueStore(spark, s"$sdir/values")
      val fstore = new FeatureStore(spark, s"$sdir/values",
        valueFormat = Some(vsf))
      fstore.registerTable(TableDef("orders", Seq("o_custkey", "o_totalprice"),
        Map("o_totalprice" -> "numeric")), Tables.orders(spark, dir)): Unit
      fstore.defineFeature(FeatureDef("total_spend", "orders", "numeric",
        df => df.groupBy(col("o_custkey").as("entity_id"))
          .agg(sum("o_totalprice").as("value")))): Unit
      var t0 = System.nanoTime()
      require(fstore.computeVersion("total_spend", "v1").isRight)
      println(f"STRESS streaming_refresh_compute    ${(System.nanoTime() - t0) / 1e9}%8.2f s   (7.5M orders -> per-customer spend)")
      val base = s"$sdir/online"
      t0 = System.nanoTime()
      fstore.publishOnlineGeneration(base, buckets = 64): Unit
      println(f"STRESS streaming_refresh_seed       ${(System.nanoTime() - t0) / 1e9}%8.2f s   (gen=0 publish)")

      val ids = fstore.featureVectors().select("entity_id")
        .as[String].collect().sorted // customers: dim-sized, driver-safe
      val probe = ids.head
      val v0 = FeatureStore.readOnlineVectorLatest(spark, base, probe)("total_spend")
        .asInstanceOf[Double]
      val nBatches = 6
      val legal = (Set(v0) ++ (1 to nBatches).map(_ * 1000.0)).map(d => d: java.lang.Double)

      // concurrent poller: EVERY read through the publish+prune churn
      // must succeed and see a value that existed at some point
      val stopPoll = new java.util.concurrent.atomic.AtomicBoolean(false)
      val polls = new java.util.concurrent.atomic.AtomicInteger(0)
      val pollErr = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
      val poller = new Thread(() => {
        while (!stopPoll.get()) {
          try {
            val v = FeatureStore.readOnlineVectorLatest(spark, base, probe)("total_spend")
              .asInstanceOf[Double]
            if (!legal.contains(v))
              throw new IllegalStateException(s"poller saw illegal value $v")
            polls.incrementAndGet(): Unit
          } catch { case e: Throwable =>
            pollErr.compareAndSet(null, e); stopPoll.set(true)
          }
        }
      })
      poller.start()

      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Double, java.sql.Timestamp)]
      val corr = mem.toDS().toDF("entity_id", "value", "computed_at")
        .select(col("entity_id"), col("value"),
          lit(null).cast("string").as("value_str"), col("computed_at"),
          lit("total_spend").as("feature_name"), lit("v1").as("version"))
      val latencies = collection.mutable.ArrayBuffer.empty[Double]
      val q = corr.writeStream
        .option("checkpointLocation", s"$sdir/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], i: Long) =>
            // the writer body verbatim, instrumented per batch
            val tb = System.nanoTime()
            graft.streaming.StreamingOnlineRefresh.applyBatch(
              fstore, vsf, b.toDF(), base, buckets = 64, keep = Some(2)): Unit
            val dt = (System.nanoTime() - tb) / 1e9
            latencies.synchronized { latencies += dt: Unit }
            println(f"STRESS streaming_refresh_batch      $dt%8.2f s   (batch $i: merge+publish+prune)")
        }.start()
      val tsBase = System.currentTimeMillis() + 60000L
      try {
        for (bi <- 1 to nBatches) {
          // every customer corrected every batch — full-view churn,
          // the worst case for publish+prune
          mem.addData(ids.toSeq.map(e =>
            (e, bi * 1000.0, new java.sql.Timestamp(tsBase + bi * 60000L))): _*)
          q.processAllAvailable()
        }
      } finally { q.stop(); stopPoll.set(true); poller.join() }

      require(pollErr.get() == null, s"poller anomaly: ${pollErr.get()}")
      require(polls.get() > 0, "poller never overlapped the stream")
      val got = FeatureStore.readOnlineVectorLatest(spark, base, probe)("total_spend")
        .asInstanceOf[Double]
      require(got == nBatches * 1000.0, s"final value $got")
      val gens = fsys.listStatus(new org.apache.hadoop.fs.Path(base))
        .map(_.getPath.getName).count(_.startsWith("gen="))
      require(gens <= 3, s"prune(keep=2) left $gens generations")
      val ls = latencies.synchronized(latencies.toSeq)
      println(f"STRESS streaming_refresh_summary    batches=${ls.size} " +
        f"min=${ls.min}%.2f s median=${ls.sorted.apply(ls.size / 2)}%.2f s " +
        f"max=${ls.max}%.2f s polls=${polls.get()} gens_kept=$gens")
    }

    scenario("mart_quarantine") {
      // r16: the G45 quarantine tee + fold-back loop at 50× — per-batch
      // tee and fold costs over day-aligned fact chunks, then a full
      // late-delivery repair through reconcile(log ∪ quarantine). The
      // heavy BODIES are driven directly (applyBatch/quarantineBatch —
      // public per the G21/G33 convention; streaming a 30M-row fact
      // through MemoryStream would measure driver serialization, not
      // the engine); the stream WIRING is spec-scale-covered.
      import graft.streaming.StreamingMartMaintenance
      val root = s"$dir/mart_quarantine"
      val rp = new org.apache.hadoop.fs.Path(root)
      rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(rp, true)
      val m = s"$root/mart"; val qd = s"$root/quarantine"
      // a KEYED copy of the fact log, written once: the keyed foldBack
      // (r18) needs a unique row key, and the SYNTHETIC corpus does
      // not carry TPC-H's (l_orderkey, l_linenumber) uniqueness (the
      // keyed guard itself proved that at 50× — pinned below). A real
      // deployment's fact log has one; here a surrogate id is stamped
      // ONCE at write time, so every later read (spans, tee, log,
      // twin) sees stable keys.
      val keyedOut = s"$root/lineitem_keyed.parquet"
      Tables.lineitem(spark, dir)
        .withColumn("l_rowkey", monotonically_increasing_id())
        .write.mode("overwrite").parquet(keyedOut)
      val li = spark.read.parquet(keyedOut)
      // six contiguous DAY-ALIGNED spans (refreshFromPartials refuses
      // day-straddling handoffs — alignment is the operating contract)
      val dayCol = col("l_shipdate").cast("date")
      val r0 = li.agg(min(dayCol), max(dayCol)).head()
      val (d0, d1) = (r0.getDate(0).toLocalDate, r0.getDate(1).toLocalDate)
      val spanDays = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) / 6 + 1
      def span(i: Int) = li.filter(
        dayCol >= lit(java.sql.Date.valueOf(d0.plusDays(i * spanDays))) &&
        dayCol < lit(java.sql.Date.valueOf(d0.plusDays((i + 1) * spanDays))))
      def partialsOf(rows: DataFrame): DataFrame = rows
        .withColumn("_ship_ts", col("l_shipdate").cast("timestamp"))
        .groupBy(window(col("_ship_ts"), "1 day"),
          col("l_partkey"), col("l_suppkey"))
        .agg(SupplyMart.measureExprs.head, SupplyMart.measureExprs.tail: _*)
        .drop("window", "_ship_ts")
      // seed spans 1..5 through the stream bodies (span 0 withheld —
      // it will arrive "late"); tee first, then fold, per batch
      for (i <- 1 to 5) {
        val chunk = span(i)
        var t0 = System.nanoTime()
        val qn = StreamingMartMaintenance.quarantineBatch(spark, chunk, m, qd, i.toLong)
        val teeS = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val r = StreamingMartMaintenance.applyBatch(spark, partialsOf(chunk), m, buckets = 64)
        val foldS = (System.nanoTime() - t0) / 1e9
        println(f"STRESS mart_quarantine_batch        tee=$teeS%6.2f s fold=$foldS%6.2f s   (batch $i: quarantined=$qn touched=${r.touched})")
        require(qn == 0L, s"batch $i quarantined $qn rows of pending days")
      }
      // the late delivery: span 0's raw rows arrive after every later
      // day folded — the tee must capture them row-for-row
      val late = span(0)
      val lateN = late.count()
      var t0 = System.nanoTime()
      val qn = StreamingMartMaintenance.quarantineBatch(spark, late, m, qd, 99L)
      println(f"STRESS mart_quarantine_late_tee     ${(System.nanoTime() - t0) / 1e9}%8.2f s   captured=$qn of $lateN")
      require(qn == lateN, s"tee captured $qn of $lateN late rows")
      val absorbed = (1 to 5).map(span).reduce(_ unionByName _)
      // the natural TPC-H key is NOT unique in this synthetic corpus —
      // pin that the keyed guard REFUSES it at 50× instead of silently
      // corrupting the repair. ANY of the key-contract refusals counts
      // (a generator change could surface the null-key or
      // key-vs-payload shape instead of non-uniqueness); a refusal
      // fires before reconcile, so the mart stays untouched for the
      // measured run below — whereas a fully-SUCCEEDING foldBack here
      // means the generator now enforces the key: the require tells
      // the maintainer to measure on the natural key instead (the mart
      // is then already repaired; re-derive the scenario).
      val naturalRefused =
        try {
          StreamingMartMaintenance.foldBack(spark, absorbed, qd, m,
            buckets = 64, keyCols = Seq("l_orderkey", "l_linenumber"))
          false
        } catch {
          case e: IllegalStateException
            if e.getMessage.contains("foldBack keyCols") => true
        }
      require(naturalRefused, "expected the keyed guard to refuse the " +
        "non-unique synthetic (l_orderkey, l_linenumber) — if the " +
        "generator became unique, measure on the natural key instead")
      println("STRESS mart_quarantine_keyguard     refused non-unique natural key (mart untouched)")
      // fold-back via the SAFE verb, KEYED on the surrogate unique row
      // key (r18 directive 3: the keyed form closes the bag residual —
      // byte-identical duplicate rows split across absorbed/dropped —
      // and this measures its real cost: the key uniqueness probes +
      // the keyed join with payload-consistency check replacing
      // exceptAll, all restricted to the quarantined days)
      t0 = System.nanoTime()
      val rewritten = StreamingMartMaintenance.foldBack(
        spark, absorbed, qd, m, buckets = 64, keyCols = Seq("l_rowkey"))
      println(f"STRESS mart_quarantine_reconcile    ${(System.nanoTime() - t0) / 1e9}%8.2f s   buckets_rewritten=$rewritten")
      val twin = s"$root/twin"
      SupplyMart.refresh(spark, li, twin, buckets = 64): Unit
      val a = SupplyMart.read(spark, m); val b = SupplyMart.read(spark, twin)
      require(a.except(b).isEmpty && b.except(a).isEmpty,
        "fold-back mart diverged from the full compute at 50x")
      require(SupplyMart.refresh(spark, li, m, buckets = 64).lateRows == 0L,
        "audit not clean after quarantine fold-back")
      println(f"STRESS mart_quarantine_verified     mart rows=${a.count()} == twin (exact)")
    }

    spark.stop()
  }
}
