package graft.operators

import graft.registry.Incremental
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental corpus deduplication — [[DedupPipeline]] extended with the
  * high-water-mark pattern of [[graft.registry.Incremental]] (G14), so a
  * daily crawl drop dedups against the EXISTING cluster state instead of
  * recomputing the corpus. At 100 TB the difference is a refresh that
  * scans only the new documents plus the stored (id, shingle) index of
  * prior representatives, versus re-shingling and re-pairing everything
  * ever ingested.
  *
  * Durable state under `statePath` (all parquet + the atomic `_watermark`
  * protocol shared with Incremental):
  *
  *   - `hashes/batch=*`  (_h, rep): exact-text-hash → representative id.
  *     New batches land in their own `batch=` directory keyed by the
  *     watermark they extend. A batch directory is COMMITTED only once
  *     the watermark has advanced past its tag; readers filter to
  *     committed batches, so a refresh that crashed after writing its
  *     directory but before advancing the watermark leaves state the
  *     retry cannot see — the retry re-derives the batch from scratch
  *     and overwrites the orphan directory. Idempotent without an ACID
  *     table format (Delta/Iceberg are environment-blocked; this is the
  *     same adjudicated substitute as the FeatureStore manifest).
  *   - `shingles/batch=*` (doc_id, shingle): the near-dup blocking index
  *     of prior REPRESENTATIVES only (exact-dup members never shingle).
  *   - `assign/batch=*` (doc_id, cluster_id): every doc's cluster label —
  *     tiny relative to the corpus (two longs/doc); a FULL SNAPSHOT per
  *     refresh (not a delta) because a new doc can BRIDGE two existing
  *     clusters and relabel all their members. Readers take the LATEST
  *     committed snapshot, so the non-atomicity of a parquet overwrite
  *     never corrupts prior state: a torn snapshot is by definition
  *     uncommitted and invisible. Superseded snapshots are pruned
  *     best-effort after each commit.
  *
  * A refresh processes docs with id > watermark (the G14 caveat applies:
  * ids must be ingestion-monotonic — a late row under an already-passed
  * watermark is skipped):
  *
  *   1. exact dedup of the batch against `hashes` (old hash → inherit the
  *      old representative) and within the batch (min id per new hash);
  *   2. shingle NEW representatives only; candidate pairs = df-capped
  *      shingle blocking of new-rep shingles against the UNION index, so
  *      every candidate touches ≥ 1 new doc — old-old pairs were found by
  *      earlier refreshes and never re-verify;
  *   3. exact Jaccard verification ([[MinHashLsh.verifiedPairs]]) over
  *      the union index, candidates only;
  *   4. connected components over the DELTA graph: the new pairs plus one
  *      (rep → its current cluster label) edge per involved old rep.
  *      Labels are cluster-minimum ids and new ids exceed all old ids, so
  *      the delta CC's min label equals the full recompute's — merges of
  *      existing clusters propagate to ALL their members through a keyed
  *      relabel join on `cluster_id`, not by walking the old graph.
  *
  * IncrementalDedupSpec proves refresh-by-parts ≡ [[DedupPipeline.dedup]]
  * over the whole corpus on the real documents table. Parity is exact
  * while the `maxDf` cap never binds; a binding cap can only make the
  * incremental path find MORE true pairs than the one-shot (df grows with
  * the corpus, and verification is exact either way), never admit a false
  * one. Run with the same (threshold, maxDf) every refresh.
  */
object IncrementalDedup {

  private val hashesSchema = StructType(Seq(
    StructField("_h", StringType), StructField("rep", LongType)))
  private val shinglesSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("shingle", StringType)))
  private val assignSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("cluster_id", LongType)))

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tagOf(wm: Long): String =
    if (wm == Long.MinValue) "init" else wm.toString

  /** None for a directory whose `batch=` tag is neither `init` nor a
    * long — a stray/foreign dir must be skipped, not crash every read. */
  private def tagValue(t: String): Option[Long] =
    if (t == "init") Some(Long.MinValue) else scala.util.Try(t.toLong).toOption

  /** (tag value, path) of every batch directory under `dir` whose tag is
    * strictly below the current watermark — i.e. whose writing refresh
    * went on to advance the watermark past it. The at-most-one
    * uncommitted directory (tag == current watermark) is excluded, which
    * is the crash-retry guarantee: a retry sees exactly the state the
    * failed attempt saw. */
  private def committedBatches(spark: SparkSession, dir: String,
      wm: Long): Seq[(Long, String)] = {
    val p = new Path(dir)
    val hfs = fs(spark, dir)
    if (!hfs.exists(p)) Seq.empty
    else hfs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .flatMap(s => tagValue(s.getPath.getName.stripPrefix("batch="))
        .map(v => (v, s.getPath.toString)))
      .filter(_._1 < wm)
  }

  private def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Union of all committed batch directories (hashes/shingles deltas). */
  private def readCommitted(spark: SparkSession, dir: String,
      schema: StructType, wm: Long): DataFrame = {
    val dirs = committedBatches(spark, dir, wm).map(_._2)
    if (dirs.isEmpty) emptyDf(spark, schema)
    else spark.read.parquet(dirs: _*)
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Latest committed assign snapshot (full-corpus labels). */
  private def readAssign(spark: SparkSession, statePath: String,
      wm: Long): DataFrame =
    committedBatches(spark, s"$statePath/assign", wm)
      .sortBy(_._1).lastOption match {
      case Some((_, dir)) => spark.read.parquet(dir)
        .select(assignSchema.fieldNames.map(col).toSeq: _*)
      case None => emptyDf(spark, assignSchema)
    }

  private def shingle(docs: DataFrame, id: String, text: String): DataFrame =
    docs
      .select(col(id).as("doc_id"), split(col(text), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))

  /** Current labels: (doc_id, cluster_id, keep) for every doc ever
    * refreshed — the same contract as [[DedupPipeline.dedup]]. */
  def assignments(spark: SparkSession, statePath: String): DataFrame =
    readAssign(spark, statePath, Incremental.watermark(spark, statePath))
      .withColumn("keep", col("doc_id") === col("cluster_id"))

  /** Incorporate all docs with id above the watermark. Returns the
    * number of new documents processed (0 = nothing new). */
  def refresh(spark: SparkSession, docs: DataFrame, statePath: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, maxDf: Int = 1000): Long = {
    val wm = Incremental.watermark(spark, statePath)
    val fresh = docs.filter(col(idCol) > wm)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val hashedNew = fresh.withColumn("_h", md5(col("text"))).localCheckpoint(true)
    val nFresh = hashedNew.count()
    if (nFresh == 0) return 0L

    val oldHashes = readCommitted(spark, s"$statePath/hashes", hashesSchema, wm)
    val oldShingles = readCommitted(spark, s"$statePath/shingles", shinglesSchema, wm)
    val oldAssign = readAssign(spark, statePath, wm)

    // 1. exact dedup: against prior corpus, then within the batch
    val knownRep = hashedNew.join(oldHashes, Seq("_h"))
      .select(col("doc_id"), col("rep"))
    val unknown = hashedNew.join(oldHashes, Seq("_h"), "left_anti")
    val newHashRep = unknown.groupBy(col("_h")).agg(min(col("doc_id")).as("rep"))
      .localCheckpoint(true)
    val mappedNew = unknown.join(newHashRep, Seq("_h"))
      .select(col("doc_id"), col("text"), col("rep"))

    // 2. candidate pairs touching >= 1 new representative
    val newShingled = shingle(
      mappedNew.filter(col("doc_id") === col("rep")), "doc_id", "text")
      .localCheckpoint(true)
    val unionShingled = oldShingles.unionByName(newShingled).localCheckpoint(true)
    val rare = unionShingled.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
      .select("shingle")
    val blockedNew = newShingled.join(rare, Seq("shingle"), "left_semi")
    val blockedAll = unionShingled.join(rare, Seq("shingle"), "left_semi")
    val candidates = blockedNew.select(col("doc_id").as("id_x"), col("shingle"))
      .join(blockedAll.select(col("doc_id").as("id_y"), col("shingle")), Seq("shingle"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()

    // 3. exact verification over the union index, candidates only
    val pairs = MinHashLsh.verifiedPairs(unionShingled, "doc_id", candidates, threshold)
      .select("id_a", "id_b").localCheckpoint(true)

    // 4. delta-graph components: new pairs + (old rep -> current label)
    val involved = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    val oldRepEdges = involved.join(oldAssign, Seq("doc_id"))
      .select(col("doc_id").as("id_a"), col("cluster_id").as("id_b"))
    val comps = DedupClusters.connectedComponents(
      pairs.unionByName(oldRepEdges), "id_a", "id_b").localCheckpoint(true)

    // relabel existing members through their cluster id (bridging merges)
    val assignOld = oldAssign
      .join(comps.select(col("id").as("cluster_id"), col("comp")), Seq("cluster_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("cluster_id")).as("cluster_id"))
    // new representatives: component label, or themselves if unpaired
    val assignNewReps = mappedNew.filter(col("doc_id") === col("rep"))
      .join(comps, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster_id"))
      .localCheckpoint(true)
    // batch exact-dup members inherit their new representative's label
    val assignNewDups = mappedNew.filter(col("doc_id") =!= col("rep"))
      .join(assignNewReps.select(col("doc_id").as("rep"), col("cluster_id")), Seq("rep"))
      .select(col("doc_id"), col("cluster_id"))
    // exact dups of PRIOR docs inherit the (possibly relabeled) old rep
    val assignKnown = knownRep
      .join(assignOld.select(col("doc_id").as("rep"), col("cluster_id")), Seq("rep"))
      .select(col("doc_id"), col("cluster_id"))

    val assign = assignOld.unionByName(assignNewReps).unionByName(assignNewDups)
      .unionByName(assignKnown)
      .localCheckpoint(true) // materialize before overwriting its own source

    // writes: all three outputs are keyed by the watermark they extend,
    // so a retry of a failed refresh overwrites its own output and
    // readers (filtered to committed tags) never see a torn batch; the
    // watermark advances LAST, committing all three at once
    val tag = tagOf(wm)
    newHashRep.select("_h", "rep").write.mode("overwrite")
      .parquet(s"$statePath/hashes/batch=$tag")
    newShingled.write.mode("overwrite")
      .parquet(s"$statePath/shingles/batch=$tag")
    assign.write.mode("overwrite").parquet(s"$statePath/assign/batch=$tag")
    val newWm = hashedNew.agg(max(col("doc_id"))).head().getLong(0)
    Incremental.writeWatermark(spark, statePath, math.max(wm, newWm))
    // prune superseded assign snapshots (best-effort: a failure here
    // costs disk, never correctness — readers take the latest committed)
    val hfs = fs(spark, statePath)
    committedBatches(spark, s"$statePath/assign", wm)
      .foreach { case (_, dir) =>
        try hfs.delete(new Path(dir), true) catch { case _: Exception => () }
      }
    nFresh
  }
}
