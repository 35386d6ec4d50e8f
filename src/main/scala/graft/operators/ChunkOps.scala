package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-set assembly operators (SURVEY §2 E16–E17, D8): the steps
  * between a curated corpus and a token stream a trainer can consume.
  *
  *  - [[textChunk]]: context-window chunking — fixed token windows with
  *    stride overlap, the standard pre-training "chunk long documents"
  *    step. Pure projection + explode: zero shuffles at any scale, and
  *    the fan-out is bounded by tokens/stride per document.
  *  - [[shardPack]]: token-budget sequence packing — assign documents
  *    (in stable doc_id order) to contiguous training shards of ~budget
  *    tokens each. The shard id is pure prefix-sum arithmetic
  *    (floor(tokens-before / budget)), so at scale it runs on
  *    [[RankOps.exclusivePrefixSum]] — range-repartition + partition
  *    offsets — never a single-partition global window.
  *  - [[embCentroid]]: per-label mean embedding, emitted as exact
  *    scaled-integer sums + counts per (label, dimension). Floats are
  *    scaled to 1e-7-resolution longs BEFORE the sum, so the aggregate
  *    is order-independent and bit-identical across engines — a
  *    float/double sum would depend on partial-aggregation order.
  *
  * Reference scope: the reference serves per-entity feature rows
  * (main.py:236-321) and leaves training-set layout to the consumer;
  * these close that gap Spark-first for an LLM-scale pipeline.
  */
object ChunkOps {

  /** Token window / stride (overlap = window - stride) for E16. Sized
    * so the sf corpora (avg ~54 tokens/doc) exercise multi-chunk docs
    * AND the tail-chunk truncation path. */
  private val Window = 32
  private val Stride = 24

  /** Token budget per training shard for E17. */
  private val Budget = 512L

  /** Tokens = non-empty whitespace splits — the one definition shared
    * by both E16 and E17 (and the DuckDB oracles verbatim). */
  private def toks = filter(split(col("text"), "\\s+"), t => t =!= lit(""))

  /** The chunking plan shared by [[textChunk]] and
    * [[TrainingExport.writeShards]]: (doc_id, chunk_idx, n_chunk_tokens,
    * chunk_text) per window. Narrow — tokenize once, explode a per-row
    * index sequence, slice; no shuffle at any scale. */
  private[operators] def chunkPlan(docs: DataFrame, w: Int, s: Int): DataFrame =
    docs
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("n_chunks",
        expr(s"1L + (greatest(n_tokens - $w, 0L) + ${s - 1}) div $s"))
      .select(col("doc_id"), col("toks"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(w.toLong), col("n_tokens") - col("chunk_idx") * s)
          .as("n_chunk_tokens"),
        array_join(
          slice(col("toks"), (col("chunk_idx") * s + 1).cast("int"), lit(w)),
          " ").as("chunk_text"))

  /** E16: context-window chunking. Each document with n > 0 tokens
    * yields ceil(max(n - W, 0) / S) + 1 chunks; chunk i covers tokens
    * [i*S + 1, min(i*S + W, n)] (1-based), so consecutive chunks
    * overlap by W - S tokens and every token is covered. */
  def textChunk(spark: SparkSession, d: String): DataFrame =
    chunkPlan(Tables.documents(spark, d), Window, Stride)
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
        md5(col("chunk_text")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  val textChunkSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, toks, len(toks) AS n_tokens,
       |    1 + (greatest(len(toks) - $Window, 0) + ${Stride - 1}) // $Stride AS n_chunks
       |  FROM t WHERE len(toks) > 0),
       |e AS (
       |  SELECT doc_id, toks, n_tokens, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
       |  FROM c)
       |SELECT doc_id, chunk_idx,
       |  CAST(least($Window, n_tokens - chunk_idx*$Stride) AS BIGINT) AS n_chunk_tokens,
       |  md5(array_to_string(list_slice(toks, chunk_idx*$Stride + 1,
       |        least(chunk_idx*$Stride + $Window, n_tokens)), ' ')) AS chunk_hash
       |FROM e
       |ORDER BY doc_id, chunk_idx""".stripMargin

  /** E17: token-budget shard packing. Documents fill shards in doc_id
    * order; a document's shard is floor(tokens-before-it / budget) —
    * deterministic, order-stable, and computable as a distributed
    * prefix sum (RankOps.exclusivePrefixSum: range repartition +
    * per-partition windows + broadcast offsets; no global window). A
    * shard may overrun the budget by at most one document — the
    * standard contiguous-fill contract (splitting the straddling
    * document is E16's job). */
  def shardPack(spark: SparkSession, d: String): DataFrame = {
    val perDoc = Tables.documents(spark, d)
      .select(col("doc_id"), size(toks).cast("long").as("n_tok"))
    RankOps.exclusivePrefixSum(perDoc, "n_tok", "_cum", 32, col("doc_id"))
      .withColumn("shard_id", expr(s"_cum div $Budget"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard_id"))
  }

  val shardPackSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tok
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, n_tok,
       |    CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // $Budget AS BIGINT) AS shard_id
       |  FROM t)
       |SELECT shard_id, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM s GROUP BY shard_id ORDER BY shard_id""".stripMargin

  /** D8: per-label embedding centroid as exact integers. Each float is
    * converted to a 1e-7-resolution long (floor(v*1e7 + 0.5) — the
    * float→double widening is exact, so the scaling is deterministic)
    * BEFORE aggregation; the per-(label, pos) sum is then an integer
    * aggregate, immune to partial-sum ordering on both engines. The
    * centroid itself is sum_scaled / (n_vecs * 1e7), left to the
    * caller so the gated result stays exact. */
  def embCentroid(spark: SparkSession, d: String): DataFrame = {
    Tables.embeddings(spark, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("label"), (col("pos0") + 1).cast("long").as("pos"),
        floor(col("v").cast("double") * 1e7 + 0.5).as("v_scaled"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("v_scaled")).as("sum_scaled"), count(lit(1)).as("n_vecs"))
      .orderBy(col("label"), col("pos"))
  }

  val embCentroidSql: String =
    """SELECT label, pos,
      |  CAST(sum(CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS BIGINT) AS sum_scaled,
      |  count(*) AS n_vecs
      |FROM (SELECT label, embedding, unnest(generate_series(1, len(embedding))) AS pos FROM embeddings)
      |GROUP BY label, pos
      |ORDER BY label, pos""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_chunk" -> textChunk _,
    "shard_pack" -> shardPack _,
    "emb_centroid" -> embCentroid _)

  val oracles: Map[String, String] = Map(
    "text_chunk" -> textChunkSql,
    "shard_pack" -> shardPackSql,
    "emb_centroid" -> embCentroidSql)
}
