package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D11: hashed TF-IDF document vectors — the lexical bridge into the
  * dense-vector stack. SemDedup (D9), IVF serving (D7), and cosine
  * near-dup (C5/D1) all consume a unit-length `Array[Float]` embedding
  * column; real pipelines get it from a neural encoder, but a 100 TB
  * first pass often cannot afford model inference over every doc.
  * Hashed TF-IDF (the Weinberger et al. 2009 "feature hashing" trick
  * over Salton's tf·idf weighting, sklearn's HashingVectorizer +
  * TfidfTransformer composition) gives a model-free vector whose
  * cosine tracks lexical overlap — enough for topic clustering,
  * cluster-balanced sampling, and a SemDedup tier when no encoder is
  * in reach. One function, and the ENTIRE D-stack lights up for plain
  * text.
  *
  * Shape:  term → bucket = pmod(xxhash64(term), dim)   (hash trick:
  * no vocabulary dictionary, no driver state, collisions bounded by
  * dim and harmless for similarity — they only ever ADD overlap)
  *   tf    one explode + one map-side-combinable groupBy
  *   df    per BUCKET (≤ dim rows — an aggregation whose output is
  *         bounded by the chosen dimensionality, not the vocabulary),
  *         broadcast back
  *   idf   ln((1+N)/(1+df)) + 1  (sklearn smooth_idf: defined even
  *         for a bucket hit by every doc, never negative)
  *   vec   dense dim-length float array, L2-normalized, assembled
  *         row-locally from the doc's (bucket, weight) map
  *
  * The analyzer is [[Bm25.tokenize]] — one tokenization convention
  * across gates, sparse retrieval, and vectors (two analyzers that
  * drift is the classic silent-mismatch bug class).
  *
  * Scale shape: two corpus-keyed shuffles (tf groupBy, doc reassembly
  * groupBy) of narrow rows, one ≤dim-row broadcast; the dense array is
  * dim·4 bytes per doc (256 floats = 1 KiB — the same budget as a real
  * embedding column). Documents with NO tokens come back as the zero
  * vector (cosine 0 to everything — inert in every downstream op, and
  * kept so row counts are preserved; the fail-closed convention is the
  * caller's gate, not a silently vanished row).
  */
object TfidfVectors {

  /** (idCol, embedding: Array[Float] unit-L2 or all-zero). `dim` must
    * be a power of two ≤ 4096 (pmod of xxhash64 is uniform for any
    * modulus; the power-of-two convention just keeps layouts
    * predictable across the repo). */
  def vectorize(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dim: Int = 256): DataFrame = {
    require(dim > 0 && dim <= 4096 && (dim & (dim - 1)) == 0,
      s"dim $dim must be a power of two in (0, 4096]")
    val toks = docs.select(col(idCol),
      Bm25.tokenize(col(textCol)).as("_toks"))
    val tf = toks
      .select(col(idCol), explode(col("_toks")).as("term"))
      .select(col(idCol),
        pmod(xxhash64(col("term")), lit(dim.toLong)).cast("int").as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val n = docs.select(col(idCol)).count()
    val idf = tf.groupBy(col("bucket"))
      .agg(count(lit(1)).as("df"))
      .select(col("bucket"),
        (log((lit(1.0) + n) / (lit(1.0) + col("df"))) + 1.0).as("idf"))
    val weighted = tf.join(broadcast(idf), Seq("bucket"))
      .select(col(idCol), col("bucket"), (col("tf") * col("idf")).as("w"))
    val dense = weighted
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("w"))))
        .as("_m"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("_m"), i), lit(0.0))).as("_v"))
      .select(col(idCol), col("_v"),
        sqrt(aggregate(col("_v"), lit(0.0), (acc, x) => acc + x * x))
          .as("_norm"))
      .select(col(idCol),
        transform(col("_v"), x => (x / col("_norm")).cast("float"))
          .as("embedding"))
    // empty docs (no postings) come back as the zero vector, same type
    docs.select(col(idCol))
      .join(dense, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("embedding"),
          expr(s"array_repeat(cast(0.0 as float), $dim)")).as("embedding"))
  }

  /** The model-free SemDedup composition: vectorize then
    * keep-the-outlier semantic dedup, one call. Thresholds for TF-IDF
    * cosine run lower than encoder cosine (lexical overlap is
    * sparser); 0.8 is the near-copy regime here.
    *
    * The vectorized frame is localCheckpoint'ed before it enters
    * SemDedup: SemDedup's execution contract is EAGER with several
    * internal actions (count, the k-means sample and fit, assignment,
    * the ranked checkpoint), and handing it the lazy multi-stage
    * tf-idf lineage recomputes the whole chain once per action —
    * measured 78 s → 23 s on the 50× post-exact-dedup corpus, the
    * DedupPipeline/SemDedup lineage convention applied at the seam
    * where the two operators meet. This makes semDedupText eager too
    * (it inherits SemDedup's documented executor-liveness caveat). */
  def semDedupText(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dim: Int = 256,
      threshold: Double = 0.8, nlist: Int = 0,
      maxClusterSize: Long = 10000L): DataFrame =
    SemDedup.semDedup(
      vectorize(docs, idCol, textCol, dim).localCheckpoint(),
      threshold = threshold, nlist = nlist, id = idCol,
      maxClusterSize = maxClusterSize)
}
