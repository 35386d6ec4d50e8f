package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.graft.{PqFunctions, VecDot}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Persisted IVF-PQ index — the serving lifecycle for [[IvfPq]].
  *
  * [[IvfPq.ivfPqTopK]] retrains the coarse quantizer and PQ codebooks and
  * re-encodes the whole corpus INSIDE every call: right for a one-shot
  * analytic query, a scale-killer for serving, where a 100 TB embedding
  * corpus is indexed once and queried millions of times. This object
  * splits the lifecycle:
  *
  *   - [[build]] trains once and writes every artifact as parquet under
  *     `path`;
  *   - [[load]] reopens the artifacts in ANY later SparkSession (no
  *     retraining, no raw-corpus scan) and [[IvfIndex.topK]] queries
  *     them — IvfIndexSpec proves `load(path).topK` returns results
  *     identical to `ivfPqTopK` at equal seed/params, and proves it from
  *     a fresh session;
  *   - [[IvfIndex.add]] appends new vectors as a committed batch —
  *     coarse-assign to the EXISTING centroids, PQ-encode with the
  *     existing codebooks, no retrain — so daily embedding drops extend
  *     the index in O(delta).
  *
  * On-disk layout (all parquet; same commit discipline as the
  * FeatureStore manifest and the Incremental watermark — `_meta` is
  * written LAST via the knob-governed pointer protocol
  * ([[BatchedState.writePointer]], r17: rename mode keeps the atomic
  * temp+replace swap; `spark.graft.commit.mode=manifest` commits
  * create-new numbered manifests with zero renames), so a crashed
  * build/add leaves only invisible orphan directories that the retry
  * overwrites):
  *
  *   - `centroids/` (list_id, centroid float[], cnorm2): the coarse
  *     quantizer — a few KB, broadcast at query time.
  *   - `codebook/` (codebook float[]): the flat PQ codebook
  *     (m·ksub·dsub floats), shipped into the codegen'd expressions as a
  *     literal exactly as the transient path does.
  *   - `codes/batch=N/list_id=L/` (neighbor_id, codes binary, _salt):
  *     the m-byte-per-vector inverted lists, PARTITIONED BY list_id —
  *     a query planning nprobe lists reads only those partitions
  *     (PartitionFilters on the parquet scan, spec-audited), i.e.
  *     ~nprobe/nlist of the index instead of all of it.
  *   - `vectors/batch=N/list_id=L/` (neighbor_id, ec float[]): raw
  *     embeddings for the exact re-rank, partitioned by the SAME coarse
  *     assignment as the codes. Every shortlist id comes out of a probed
  *     list's codes, so its vector lives in a probed list's partition
  *     here too — the re-rank scan prunes to ~nprobe/nlist of the raw
  *     store exactly like the codes scan (both PartitionFilters are
  *     spec-audited), instead of reading the corpus-sized store whole
  *     per query batch. This doubles index storage vs codes alone; it
  *     is what buys exact cosine ordering on the final k without
  *     keeping the source corpus around.
  *   - `_meta` (k=v lines): params + the list of COMMITTED batch ids.
  *     Readers union exactly the committed batches, so a half-written
  *     `add` is invisible until its meta swap lands.
  *   - `_lock_add` (transient): the writer lock — [[IvfIndex.add]] and
  *     [[IvfIndex.compact]] create it atomically with overwrite=false
  *     (the FeatureStore per-version lock convention), so two concurrent
  *     writers cannot both read the same `batches` list and silently
  *     drop one another's meta swap. The loser fails loudly before
  *     writing anything; a hard-crashed writer leaves a stale lock an
  *     operator removes — fail-safe, never lost data.
  *
  * [[build]] deletes and replaces the whole tree (a rebuild, not a
  * merge); use [[IvfIndex.add]] to extend an existing index in place and
  * [[IvfIndex.compact]] to fold accumulated add batches back into one
  * generation (read fan-in is batches × probed lists until then).
  */
object IvfIndex {

  private[operators] final case class Meta(dims: Int, m: Int, ksub: Int,
      nlist: Int, saltFactor: Int, seed: Long, batches: Seq[Int],
      prevBatches: Seq[Int] = Seq.empty)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metaPath(path: String) = new Path(s"$path/_meta")

  private def writeMeta(spark: SparkSession, path: String, meta: Meta): Unit = {
    val body =
      s"""version=2
         |dims=${meta.dims}
         |m=${meta.m}
         |ksub=${meta.ksub}
         |nlist=${meta.nlist}
         |saltFactor=${meta.saltFactor}
         |seed=${meta.seed}
         |batches=${meta.batches.mkString(",")}
         |prev=${meta.prevBatches.mkString(",")}
         |""".stripMargin
    // knob-governed commit (r17): rename mode = the temp + atomic
    // replace this index always used; manifest mode = create-new
    // numbered manifests, zero renames on the commit path
    BatchedState.writePointer(spark, metaPath(path), body)
  }

  private def readMeta(spark: SparkSession, path: String): Meta = {
    // readPointer: legacy bare k=v files parse through; a torn
    // rename-mode file refuses loudly; a manifest-mode directory with
    // no complete manifest (a crashed FIRST build) reads as absent
    val txt = BatchedState.readPointer(spark, metaPath(path))
    require(txt.nonEmpty,
      s"no committed IvfIndex at $path (missing _meta — crashed or absent build)")
    val kv = txt.get.linesIterator
      .filter(_.contains("=")).map { l =>
        val Array(k, v) = l.split("=", 2); (k, v) }.toMap
    // v1 wrote the raw-vector store un-partitioned; a v2 reader pruning
    // it by list_id would fail confusingly mid-query — fail loudly here
    require(kv.getOrElse("version", "?") == "2",
      s"IvfIndex at $path is layout version ${kv.getOrElse("version", "?")}, " +
        "this reader needs version 2 (list_id-partitioned vectors) — rebuild")
    Meta(kv("dims").toInt, kv("m").toInt, kv("ksub").toInt,
      kv("nlist").toInt, kv("saltFactor").toInt, kv("seed").toLong,
      kv("batches").split(",").filter(_.nonEmpty).map(_.toInt).toSeq,
      kv.getOrElse("prev", "").split(",").filter(_.nonEmpty).map(_.toInt).toSeq)
  }

  /** Train + encode ONCE, write all artifacts under `path` (replacing
    * any index already there), commit via `_meta`. Training is bounded
    * exactly like the transient path: coarse k-means and PQ Lloyd's run
    * on ≤ maxTrainRows samples regardless of corpus size, and encoding
    * is a broadcast-model/literal-codebook projection — two narrow
    * corpus scans (codes write, vectors write), zero shuffles except
    * the partitioned writes. */
  def build(vecs: DataFrame, id: String, path: String, nlist: Int = 0,
      m: Int = 16, ksub: Int = 64, seed: Long = 42L,
      maxTrainRows: Long = 50000L, saltFactor: Int = 4): Unit = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val n = vecs.count()
    val nl = if (nlist > 0) nlist else IvfSearch.defaultNlist(n)
    val model = IvfSearch.trainModel(vecs, n, nl, seed, maxTrainRows)
    val sample = IvfPq.pqSample(vecs, n, ksub, maxTrainRows, seed)
    val dim = sample.head.length
    require(dim % m == 0, s"embedding dim $dim must be divisible by m=$m")
    val cb = IvfPq.trainCodebooks(sample, m, ksub, dim / m, seed)
    val cbLit: Column = lit(cb)

    fs(spark, path).delete(new Path(path), true)
    IvfPq.centroidsFrame(model, spark).coalesce(1)
      .write.parquet(s"$path/centroids")
    Seq(Tuple1(cb)).toDF("codebook").coalesce(1)
      .write.parquet(s"$path/codebook")
    IvfPq.codedCorpus(vecs, id, model, cbLit, m, ksub, saltFactor)
      .write.partitionBy("list_id").parquet(s"$path/codes/batch=0")
    // raw vectors under the SAME coarse assignment as the codes (the
    // same broadcast model.transform — deterministic, so a shortlist id
    // from a probed list's codes always has its vector in that list's
    // partition here): one more narrow corpus scan, and the re-rank
    // read prunes forever after
    model.transform(
        vecs.withColumn("features", org.apache.spark.ml.functions
          .array_to_vector(col("embedding"))))
      .select(col(id).as("neighbor_id"), col("prediction").as("list_id"),
        col("embedding").as("ec"))
      .write.partitionBy("list_id").parquet(s"$path/vectors/batch=0")
    writeMeta(spark, path, Meta(dim, m, ksub, nl, saltFactor, seed, Seq(0)))
  }

  /** Reopen a committed index. Centroids and codebook (KBs) load to the
    * driver here, once — queries reuse them as broadcast/literals. */
  def load(spark: SparkSession, path: String): IvfIndex =
    new IvfIndex(spark, path, readMeta(spark, path))
}

/** Driver-bounded occupancy summary from [[IvfIndex!.stats]]: `perList`
  * holds one entry per non-empty list (≤ nlist), `imbalance` is the max
  * list size over the all-lists mean — the signal that frozen-centroid
  * adds have drifted and a [[IvfIndex!.rebuild]] is due. */
final case class IvfIndexStats(nlist: Int, batches: Int, total: Long,
    nonEmptyLists: Int, maxList: Long, meanPerList: Double,
    imbalance: Double, perList: Map[Int, Long])

/** A loaded index handle — see [[IvfIndex$]] for the layout. */
final class IvfIndex private[operators] (spark: SparkSession, path: String,
    private var meta: IvfIndex.Meta) {
  import IvfIndex.Meta

  // driver-resident artifacts, loaded once per handle: nlist rows of
  // centroids and one flat codebook array — KBs, the same footprint the
  // transient path holds between stages
  private val centroids: Array[(Int, Array[Float], Double)] =
    spark.read.parquet(s"$path/centroids")
      .select("list_id", "centroid", "cnorm2").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
  private val codebook: Array[Float] =
    spark.read.parquet(s"$path/codebook").head().getSeq[Float](0).toArray

  private def centroidsDf: DataFrame = {
    import spark.implicits._
    centroids.toSeq.toDF("list_id", "centroid", "cnorm2")
  }

  /** The coarse quantizer as a frame — (list_id, centroid, cnorm2),
    * driver-bounded (nlist rows). Public so the learned partitioning
    * can be REUSED outside search: [[SemDedup.semDedupWithCentroids]]
    * accepts it directly (same assignment metric as [[add]] — argmax
    * 2v·c − |c|², ties to the lower list), so a corpus indexed for ANN
    * gets semantic dedup without retraining k-means. */
  def coarseCentroids: DataFrame = centroidsDf

  private def cbLit: Column = lit(codebook)

  /** Committed batch ids (visible state of the index). */
  def batches: Seq[Int] = meta.batches

  private def codes: DataFrame =
    spark.read.option("basePath", s"$path/codes")
      .parquet(meta.batches.map(b => s"$path/codes/batch=$b"): _*)
      .select(col("neighbor_id"), col("list_id").cast("int").as("list_id"),
        col("codes"), col("_salt"))

  private def vectors: DataFrame =
    spark.read.option("basePath", s"$path/vectors")
      .parquet(meta.batches.map(b => s"$path/vectors/batch=$b"): _*)
      .select(col("neighbor_id"), col("list_id").cast("int").as("list_id"),
        col("ec"))

  /** Approximate top-k neighbors — the same two-stage plan as
    * [[IvfPq.ivfPqTopK]] (it IS the same code, [[IvfPq.pqRank]]), but
    * over the stored artifacts: no training, no corpus encode, and BOTH
    * store scans read ONLY the probed list partitions — codes for the
    * ADC shortlist, raw vectors for the exact re-rank (a shortlist id's
    * vector is always in a probed list partition because codes and
    * vectors share one coarse assignment). The probed list set is
    * collected to the driver to drive partition pruning — bounded by
    * nlist (≤ 4096 ints), the same class of driver metadata as
    * Incremental's touched-days list. */
  def topK(queries: DataFrame, id: String, k: Int, nprobe: Int = 4,
      rerankFactor: Int = 8): DataFrame = {
    // materialize the probe side once: it is consumed twice (probed-list
    // collect + the candidate join) and must not recompute
    val probes = IvfPq.probeSide(queries, id, centroidsDf, cbLit,
      meta.m, meta.ksub, nprobe, meta.saltFactor).localCheckpoint(true)
    val probed = probes.select("list_id").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val corpus = codes.filter(col("list_id").isin(probed: _*))
    val emb = vectors.filter(col("list_id").isin(probed: _*))
      .select("neighbor_id", "ec")
    val qemb = queries.select(col(id).as("query_id"), col("embedding").as("eq"))
    IvfPq.pqRank(probes, corpus, emb, qemb, k, rerankFactor)
  }

  // ---- writer lock: the shared atomic create-new convention
  // (BatchedState.acquireLock — one implementation for the FeatureStore
  // per-version lock, this index, and the incremental refreshes; see
  // there for the filesystems it is and is not atomic on)
  private def addLockPath = new Path(s"$path/_lock_add")

  private def acquireWriterLock(): Unit = {
    BatchedState.acquireLock(spark, addLockPath, "IvfIndex")
    // commit-mode probe BEFORE the encode/compact work (review wave
    // r17): a knob/marker mode mismatch must refuse here, not at the
    // final writeMeta after the batch tables were written
    try BatchedState.assertPointerWritable(spark, IvfIndex.metaPath(path))
    catch { case e: Throwable => releaseWriterLock(); throw e }
  }

  private def releaseWriterLock(): Unit =
    BatchedState.releaseLock(spark, addLockPath)

  /** Append new vectors as one committed batch: coarse-assign to the
    * EXISTING centroids (argmax 2v·c − |c|², the probe metric; ties to
    * the lowest list_id — the trainer's own double-precision assignment
    * can differ only on exact ties), encode with the existing codebooks,
    * write `codes/batch=N` + `vectors/batch=N` (both partitioned by the
    * one shared assignment), then commit both by swapping `_meta`. No
    * retrain, no touch of prior batches — O(delta). The whole
    * read-modify-write runs under the writer lock, with `batches`
    * re-read AFTER acquiring it: two concurrent adds can no longer pick
    * the same batch id and silently drop one another's meta swap — the
    * loser fails loudly having written nothing. A crashed add leaves
    * orphan dirs the retry overwrites (same tag). Returns the number of
    * vectors appended. */
  def add(newVecs: DataFrame, id: String): Long = {
    val nNew = newVecs.count()
    if (nNew == 0) return 0L
    acquireWriterLock()
    try {
      // latest committed state, not this handle's snapshot: another add
      // may have landed since load — the lock makes this read current
      meta = IvfIndex.readMeta(spark, path)
      val b = meta.batches.max + 1
      val w = Window.partitionBy(col("neighbor_id"))
        .orderBy(col("cscore").desc, col("list_id"))
      // one assignment, materialized once (delta-sized), feeding BOTH
      // writes — codes and vectors must agree on list_id for the
      // re-rank's partition pruning to stay lossless
      val assigned = newVecs
        .select(col(id).as("neighbor_id"), col("embedding"))
        .crossJoin(broadcast(centroidsDf))
        .withColumn("cscore",
          lit(2.0) * VecDot.vecDot(col("embedding"), col("centroid")) - col("cnorm2"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("neighbor_id"), col("list_id"), col("embedding"))
        .localCheckpoint(true)
      assigned.select(col("neighbor_id"), col("list_id"),
          PqFunctions.pqEncode(col("embedding"), cbLit, meta.m, meta.ksub).as("codes"),
          pmod(xxhash64(col("neighbor_id")), lit(meta.saltFactor)).cast("int").as("_salt"))
        .write.mode("overwrite").partitionBy("list_id")
        .parquet(s"$path/codes/batch=$b")
      assigned.select(col("neighbor_id"), col("list_id"),
          col("embedding").as("ec"))
        .write.mode("overwrite").partitionBy("list_id")
        .parquet(s"$path/vectors/batch=$b")
      val next = meta.copy(batches = meta.batches :+ b)
      IvfIndex.writeMeta(spark, path, next)
      meta = next
      nNew
    } finally releaseWriterLock()
  }

  /** Per-list occupancy of the committed index — the recall-maintenance
    * signal. `add` assigns to FROZEN centroids forever: a drifting
    * embedding distribution crams new vectors into few lists, and at a
    * fixed nprobe the probed fraction of the corpus shrinks where the
    * data actually is — recall decays with no error anywhere. Watch
    * `imbalance` (max list size over the all-lists mean; balanced ≈ a
    * small constant, drifted → grows with every add) and [[rebuild]]
    * when it drifts. Cost: one count over the codes store reading ONLY
    * the list_id partition column — parquet answers it from footer row
    * counts, no data pages — and the result is nlist longs of driver
    * metadata, same class as the probed-list collect. */
  def stats(): IvfIndexStats = {
    val perList = codes.groupBy(col("list_id")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = perList.values.sum
    val maxList = if (perList.isEmpty) 0L else perList.values.max
    val mean = if (meta.nlist == 0) 0.0 else total.toDouble / meta.nlist
    IvfIndexStats(meta.nlist, meta.batches.size, total, perList.size,
      maxList, mean, if (mean == 0.0) 0.0 else maxList / mean, perList)
  }

  /** Retrain the WHOLE index — coarse centroids and PQ codebooks — from
    * the index's own stored raw vectors, into `destPath`: the recovery
    * move when [[stats]] shows drifted adds have unbalanced the frozen
    * centroids. The index is self-contained (the `vectors/` store holds
    * every committed embedding), so no caller corpus re-scan is needed;
    * `nlist` may be re-chosen for the grown corpus (0 = re-derive from
    * the current count, the [[build]] default). Serving switches by
    * REPOINTING: `IvfIndex.load(destPath)` once this returns — a
    * committed build is atomic behind its own `_meta`, and a path swap
    * by directory rename is NOT atomic on object stores, so the caller
    * repoints its handle/config instead (exactly the FeatureStore
    * latest-active convention). The old path stays valid for in-flight
    * readers until the operator retires it. Writes nothing under the
    * live path, but HOLDS the live index's writer lock for the
    * duration: the rebuild's training/encode scans read the live
    * codes/vectors batch directories, and the lazy-frame grace contract
    * covers only ONE compaction — two `compact()` calls completing
    * during a long rebuild scan (the second purges the generation the
    * scan is reading) would delete files out from under it. The lock
    * quiesces add/compact exactly as they quiesce each other; a
    * concurrent writer fails loudly and retries after the rebuild. */
  def rebuild(destPath: String, nlist: Int = 0,
      maxTrainRows: Long = 50000L): Unit = {
    require(destPath != path,
      "rebuild into the live path would destroy the index under its " +
        "readers — build to a new path and repoint")
    acquireWriterLock()
    try {
      meta = IvfIndex.readMeta(spark, path)
      IvfIndex.build(
        vectors.select(col("neighbor_id"), col("ec").as("embedding")),
        "neighbor_id", destPath, nlist, meta.m, meta.ksub, meta.seed,
        maxTrainRows, meta.saltFactor)
    } finally releaseWriterLock()
  }

  /** Fold every committed batch into ONE new generation — the
    * BatchedState compaction idea applied to the index: without it,
    * each `add` grows the read fan-in (batches × probed-list dirs under
    * both stores) forever. Reads all committed codes/vectors, rewrites
    * them as `batch=max+1`, swaps `_meta` to that single batch, and
    * prunes with the BatchedState keep-two-generations retention: the
    * just-replaced batches are RECORDED (`prev=` in `_meta`) and
    * survive until the NEXT `compact()` call deletes them — including a
    * call that finds the index already compact, which purges the
    * recorded generation and returns 0 rather than holding a full index
    * copy on disk until another add happens — so lazy frames from
    * handles loaded before this compact keep reading across one
    * compaction (the G17 lazy-frame contract); deletes are best-effort
    * — a failed delete costs disk, never correctness, readers follow
    * `_meta`, not the directory listing. Runs under the writer lock.
    * Returns the number of batches folded (0 = already compact). */
  def compact(): Int = {
    acquireWriterLock()
    try {
      meta = IvfIndex.readMeta(spark, path)
      if (meta.batches.size <= 1) {
        // already compact — but a generation recorded by the LAST real
        // compaction has had its one-compaction lazy-reader grace, so
        // purge it here rather than holding a full index copy on disk
        // until another add+compact cycle happens to come along
        if (meta.prevBatches.nonEmpty) {
          val stale = meta.prevBatches
          val next = meta.copy(prevBatches = Seq.empty)
          IvfIndex.writeMeta(spark, path, next)
          meta = next
          purgeBatches(stale)
        }
        return 0
      }
      val old = meta.batches
      val purge = meta.prevBatches
      val g = old.max + 1
      // overwrite, like add: a compact that crashed after writing
      // batch=g but before the meta swap recomputes the SAME g from the
      // unchanged meta on retry — the retry must replace the orphan, not
      // die on path-already-exists
      codes.write.mode("overwrite").partitionBy("list_id")
        .parquet(s"$path/codes/batch=$g")
      vectors.write.mode("overwrite").partitionBy("list_id")
        .parquet(s"$path/vectors/batch=$g")
      val next = meta.copy(batches = Seq(g), prevBatches = old)
      IvfIndex.writeMeta(spark, path, next)
      meta = next
      purgeBatches(purge)
      old.size
    } finally releaseWriterLock()
  }

  /** Best-effort delete of batch dirs under both stores — a failed
    * delete costs disk, never correctness (readers follow `_meta`). */
  private def purgeBatches(bs: Seq[Int]): Unit = {
    val hfs = addLockPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (b <- bs; store <- Seq("codes", "vectors"))
      try hfs.delete(new Path(s"$path/$store/batch=$b"), true)
      catch { case _: Exception => () }
  }
}
