package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** THE end-to-end training-data pipeline, composed from the engine's
  * own stages on the real documents table — quality gate → doc+span
  * dedup → declared mixture with oversampling (ids epoch-qualified BY
  * THE OPERATOR) → BPE tokenizer training → durable artifact round-trip
  * → id encode → token-exact packing → sharded sink → scheduled
  * scattered read — with TOKEN CONSERVATION asserted at every stage
  * boundary. Each pairwise interface has its own spec; this one proves
  * the interfaces actually compose: nothing is lost, invented, or
  * double-counted between stages, and the packSequences uniqueness
  * guard is satisfied by construction (mixtureRepeat qualifyMaxEpochs),
  * not by caller discipline. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("text→tensor end to end, token-conserving at every stage boundary", graft.Slow) {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").cache()
    val tmp = java.nio.file.Files.createTempDirectory("curpipe")

    // 1. QUALITY GATE (the rule tier)
    val gated = docs
      .join(QualityOps.qualityFlags(docs).filter(col("pass")).select("doc_id"),
        Seq("doc_id"))
      .select("doc_id", "text").cache()
    val nGated = gated.count()
    assert(nGated > 0, "gate must keep something to curate")

    // 2. DOC-LEVEL + SPAN-LEVEL DEDUP — every gated doc labeled, and
    // the span excision conserves tokens against the gated original
    val curated = DedupPipeline.curate(gated, threshold = 0.5,
      spanWindow = 8, spanMinDupCount = 2L).cache()
    assert(curated.count() === nGated)
    val keepers = curated.filter(col("keep"))
      .select("doc_id", "text", "n_tokens", "removed_tokens").cache()
    val spanViolations = keepers
      .join(gated.select(col("doc_id"),
        size(filter(split(col("text"), " "), w => length(w) > 0))
          .cast("long").as("_orig")), Seq("doc_id"))
      .filter(col("n_tokens") + col("removed_tokens") =!= col("_orig"))
    assert(spanViolations.count() === 0L,
      "span stage must conserve kept + removed ≡ original tokens")

    // 3. MIXTURE with an oversampled source, ids qualified by the
    // operator — realized rows must equal the declared copy counts
    val keepersSrc = keepers.select("doc_id", "text")
      .join(docs.select("doc_id", "source"), Seq("doc_id")).cache()
    val recipe = keepersSrc.select("source").distinct()
      .withColumn("keep_per_mille",
        when(substring(col("source"), 4, 10).cast("int") % 2 === 0, 2500L)
          .otherwise(1000L))
      .cache()
    val mixed = CurationOps.mixtureRepeat(keepersSrc, recipe,
      qualifyMaxEpochs = 3).select("doc_id", "text").cache()
    val declaredRows = CurationOps.mixtureSample(keepersSrc, recipe)
      .agg(coalesce(sum("n_copies"), lit(0L))).head().getLong(0)
    assert(mixed.count() === declaredRows,
      "materialized mixture rows must equal the declared copy counts")
    assert(mixed.select("doc_id").distinct().count() === mixed.count(),
      "qualified ids must be unique by construction")

    // 4. TOKENIZER trained on the CURATED corpus, persisted and
    // reloaded through the durable artifact before use
    val merges = TokenizerTrain.learnMergesLocal(
      keepers.select("doc_id", "text"), 16)
    val vocab = TokenEncode.buildVocab(keepers.select("doc_id", "text"),
      merges).localCheckpoint(true)
    val artPath = tmp.resolve("tokenizer").toString
    TokenizerArtifact.save(spark, artPath, merges, vocab)
    val tok = TokenizerArtifact.load(spark, artPath)

    // 5. ENCODE the mixture under the loaded artifact: every mixture
    // row encodes (gated docs are non-empty), and the vocabulary built
    // on the keepers covers their own mixture with zero OOV
    val encoded = TokenEncode.encodeCorpus(mixed, tok.merges, tok.vocab)
      .localCheckpoint(true)
    assert(encoded.count() === mixed.count())
    val cov = TokenEncode.coverageStats(mixed, tok.merges, tok.vocab).head()
    assert(cov.getLong(1) === 0L, "keeper-built vocab must cover the keeper mixture")

    // 6. PACK — conservation: packed tokens ≡ encoded tokens + one eod
    // per document; the uniqueness guard runs at its default
    val packed = TokenEncode.packSequences(encoded, seqLen = 64)
      .localCheckpoint(true)
    val totalIn = encoded.agg(sum("n_tokens")).head().getLong(0) +
      encoded.count()
    val totalPacked = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(totalPacked === totalIn,
      s"pack lost tokens: in $totalIn out $totalPacked")

    // 7. SHARDED SINK + SCHEDULED SCATTERED READ — the written artifact
    // holds exactly the packed stream, and a worker loop over an epoch
    // schedule fetches every token exactly once
    val outPath = tmp.resolve("shards").toString
    val summary = TrainingExport.writeTokenShards(packed, outPath,
      seqsPerShard = 64).cache()
    assert(summary.agg(sum("n_tokens")).head().getLong(0) === totalPacked)
    val nShards = summary.count()
    assert(nShards > 3, "corpus too small to exercise sharding")
    val sched = TrainingExport.epochSchedule(spark, nShards, epoch = 1L)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(sched.sorted.toSeq === (0L until nShards).toSeq)
    val sliceLen = math.max(1, (nShards / 3L).toInt)
    val readBack = sched.grouped(sliceLen).map { ids =>
      TrainingExport.readTokenShardsAt(spark, outPath, ids.toSeq)
        .agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)
    }.sum
    assert(readBack === totalPacked,
      "the scheduled worker loop must cover exactly the packed stream")
    // bit-exactness of the full round trip, not just counts
    val roundTrip = TrainingExport.readTokenShards(spark, outPath, 0L, nShards)
      .select("seq_id", "ids").as[(Long, Seq[Long])].collect()
      .map { case (i, s) => (i, s.toSeq) }.sortBy(_._1)
    val reference = packed.select("seq_id", "ids").as[(Long, Seq[Long])]
      .collect().map { case (i, s) => (i, s.toSeq) }.sortBy(_._1)
    assert(roundTrip.toSeq === reference.toSeq)
  }

  test("the round-10 tiers compose: line boilerplate → curate → learned gate → DSIR selection") {
    // a crawl with chrome on every page and a junk half (word-mangled,
    // disjoint vocabulary — the constructed label every classifier
    // spec uses, since the synthetic text has no natural junk)
    val real = Tables.documents(spark, sf).filter(col("doc_id") < 150)
      .select("doc_id", "text")
    val junk = Tables.documents(spark, sf)
      .filter(col("doc_id") >= 200 && col("doc_id") < 350)
      .select(col("doc_id"),
        expr("array_join(transform(filter(split(text, ' '), " +
          "w -> length(w) > 0), w -> concat(w, 'q')), ' ')").as("text"))
    val crawl = real.unionByName(junk)
      .select(col("doc_id"), concat(lit("NAVBAR HOME ABOUT\n"), col("text"),
        lit("\nCOPYRIGHT FOOTER")).as("text")).cache()

    // 1. LINE STAGE inside curate: every keeper comes back chrome-free
    val curated = DedupPipeline.curate(crawl, threshold = 0.5,
      spanWindow = 8, lineMinDocs = 2L).cache()
    assert(curated.count() === crawl.count(), "every crawl row labeled")
    val keepers = curated.filter(col("keep")).select("doc_id", "text").cache()
    assert(keepers.filter(col("text").contains("NAVBAR") ||
      col("text").contains("COPYRIGHT")).count() === 0L,
      "the line stage must strip chrome from every keeper")

    // 2. LEARNED GATE: classifier fit on the construction's labels,
    // applied to the cleaned keepers — the kept set must lean real
    val labeled = keepers
      .withColumn("label", col("doc_id") < 150)
    val model = QualityClassifier.train(labeled, dim = 1 << 14, order = 2)
      .localCheckpoint(true)
    val gated = QualityClassifier.paretoKeep(
        QualityClassifier.score(keepers, model), seed = 7L)
      .join(keepers, Seq("doc_id")).cache()
    val keptReal = gated.filter(col("keep") && col("doc_id") < 150).count()
    val keptJunk = gated.filter(col("keep") && col("doc_id") >= 200).count()
    assert(keptReal > keptJunk,
      s"learned gate must favor the real class: $keptReal vs $keptJunk")

    // 3. DSIR SELECTION over the cleaned keepers (the gate's sibling
    // tier — the Pareto gate can legitimately keep ZERO junk, which
    // would make a post-gate tilt vacuous): target = the real class,
    // raw = the whole keeper pool; the selection must lean real harder
    // than the pool does, and reproduce on any layout
    val pool = keepers.cache()
    val dsir = ImportanceResample.train(
      pool.filter(col("doc_id") < 150), pool, dim = 1 << 14)
    val k = math.max(10, (pool.count() / 3L).toInt)
    val picked = ImportanceResample.resample(pool, dsir, k, seed = 3L)
      .select("doc_id").as[Long].collect().toSet
    val pickedAgain = ImportanceResample.resample(pool.repartition(5), dsir,
      k, seed = 3L).select("doc_id").as[Long].collect().toSet
    assert(picked === pickedAgain, "selection must reproduce on any layout")
    val poolRealFrac = pool.filter(col("doc_id") < 150).count().toDouble /
      pool.count()
    val pickedRealFrac = picked.count(_ < 150).toDouble / picked.size
    assert(pickedRealFrac > poolRealFrac,
      s"DSIR must tilt toward the target: $pickedRealFrac vs pool $poolRealFrac")
  }
}
