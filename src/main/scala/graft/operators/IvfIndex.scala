package graft.operators

import org.apache.hadoop.fs.{FileContext, Options, Path}
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
  * written LAST via atomic temp+rename-with-overwrite, so a crashed
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
  *   - `vectors/batch=N/` (neighbor_id, ec float[]): raw embeddings for
  *     the exact re-rank — touched ONLY through the keyed shortlist
  *     join (k·rerankFactor rows per query), never scanned whole. This
  *     doubles index storage vs codes alone; it is what buys exact
  *     cosine ordering on the final k without keeping the source corpus
  *     around.
  *   - `_meta` (k=v lines): params + the list of COMMITTED batch ids.
  *     Readers union exactly the committed batches, so a half-written
  *     `add` is invisible until its meta swap lands.
  *
  * [[build]] deletes and replaces the whole tree (a rebuild, not a
  * merge); use [[IvfIndex.add]] to extend an existing index in place.
  */
object IvfIndex {

  private[operators] final case class Meta(dims: Int, m: Int, ksub: Int,
      nlist: Int, saltFactor: Int, seed: Long, batches: Seq[Int])

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metaPath(path: String) = new Path(s"$path/_meta")

  private def writeMeta(spark: SparkSession, path: String, meta: Meta): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(s"$path/_meta.tmp")
    val body =
      s"""version=1
         |dims=${meta.dims}
         |m=${meta.m}
         |ksub=${meta.ksub}
         |nlist=${meta.nlist}
         |saltFactor=${meta.saltFactor}
         |seed=${meta.seed}
         |batches=${meta.batches.mkString(",")}
         |""".stripMargin
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fc = FileContext.getFileContext(f.getUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(metaPath(path)),
      Options.Rename.OVERWRITE)
  }

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val f = fs(spark, path)
    require(f.exists(metaPath(path)),
      s"no committed IvfIndex at $path (missing _meta — crashed or absent build)")
    val in = f.open(metaPath(path))
    val kv = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.contains("=")).map { l =>
          val Array(k, v) = l.split("=", 2); (k, v) }.toMap
      finally in.close()
    Meta(kv("dims").toInt, kv("m").toInt, kv("ksub").toInt,
      kv("nlist").toInt, kv("saltFactor").toInt, kv("seed").toLong,
      kv("batches").split(",").filter(_.nonEmpty).map(_.toInt).toSeq)
  }

  /** Train + encode ONCE, write all artifacts under `path` (replacing
    * any index already there), commit via `_meta`. Training is bounded
    * exactly like the transient path: coarse k-means and PQ Lloyd's run
    * on ≤ maxTrainRows samples regardless of corpus size, and encoding
    * is a broadcast-model/literal-codebook projection — one corpus scan,
    * zero shuffles except the partitioned write. */
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
    vecs.select(col(id).as("neighbor_id"), col("embedding").as("ec"))
      .write.parquet(s"$path/vectors/batch=0")
    writeMeta(spark, path, Meta(dim, m, ksub, nl, saltFactor, seed, Seq(0)))
  }

  /** Reopen a committed index. Centroids and codebook (KBs) load to the
    * driver here, once — queries reuse them as broadcast/literals. */
  def load(spark: SparkSession, path: String): IvfIndex =
    new IvfIndex(spark, path, readMeta(spark, path))
}

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
      .select("neighbor_id", "ec")

  /** Approximate top-k neighbors — the same two-stage plan as
    * [[IvfPq.ivfPqTopK]] (it IS the same code, [[IvfPq.pqRank]]), but
    * over the stored artifacts: no training, no corpus encode, and the
    * codes scan reads ONLY the probed list partitions. The probed list
    * set is collected to the driver to drive partition pruning — bounded
    * by nlist (≤ 4096 ints), the same class of driver metadata as
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
    val qemb = queries.select(col(id).as("query_id"), col("embedding").as("eq"))
    IvfPq.pqRank(probes, corpus, vectors, qemb, k, rerankFactor)
  }

  /** Append new vectors as one committed batch: coarse-assign to the
    * EXISTING centroids (argmax 2v·c − |c|², the probe metric; ties to
    * the lowest list_id — the trainer's own double-precision assignment
    * can differ only on exact ties), encode with the existing codebooks,
    * write `codes/batch=N` + `vectors/batch=N`, then commit both by
    * swapping `_meta`. No retrain, no touch of prior batches — O(delta).
    * A crashed add leaves orphan dirs the retry overwrites (same tag).
    * Returns the number of vectors appended. */
  def add(newVecs: DataFrame, id: String): Long = {
    val nNew = newVecs.count()
    if (nNew == 0) return 0L
    val b = meta.batches.max + 1
    val w = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("cscore").desc, col("list_id"))
    val assigned = newVecs
      .select(col(id).as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(centroidsDf))
      .withColumn("cscore",
        lit(2.0) * VecDot.vecDot(col("embedding"), col("centroid")) - col("cnorm2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
    assigned.select(col("neighbor_id"), col("list_id"),
        PqFunctions.pqEncode(col("embedding"), cbLit, meta.m, meta.ksub).as("codes"),
        pmod(xxhash64(col("neighbor_id")), lit(meta.saltFactor)).cast("int").as("_salt"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/codes/batch=$b")
    newVecs.select(col(id).as("neighbor_id"), col("embedding").as("ec"))
      .write.mode("overwrite").parquet(s"$path/vectors/batch=$b")
    val next = meta.copy(batches = meta.batches :+ b)
    IvfIndex.writeMeta(spark, path, next)
    meta = next
    nNew
  }
}
