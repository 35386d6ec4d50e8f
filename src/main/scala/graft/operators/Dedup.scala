package graft.operators

import graft.Tables
import org.apache.spark.sql.graft.VecDot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` (SURVEY §2
  * C1–C5).
  *
  * Scale design: no operator ever materializes the all-pairs cross
  * product. Candidate pairs always come from an equi-join on a blocking
  * key — the exact text hash (C1), a shared shingle (C2), a minhash band
  * bucket (C3), the simhash value (C4) or an LSH bucket — so the shuffle
  * is keyed and map-side combinable. The portable 48-bit hash is derived
  * from md5 hex (identical in Spark and DuckDB), keeping every signature
  * oracle-checkable bit-for-bit.
  */
object Dedup {
  /** md5-derived unsigned k-hex-digit hash as a long — portable across
    * engines (`conv(hex,16,10)` ≡ DuckDB `CAST('0x'||hex AS BIGINT)`). */
  def md5Hash(c: Column, start: Int, len: Int): Column =
    conv(substring(md5(c), start, len), 16, 10).cast("long")

  private def shingles(spark: SparkSession, d: String): DataFrame = {
    // materialize the token array once: indexing split(...) inside the
    // lambda would re-split the string per element access (O(tokens^2)).
    // doc_id-hash repartition before tokenization (r18): the documents
    // table arrives as a single parquet row group, so the whole
    // tokenize+shingle+explode chain otherwise runs in ONE scan task
    // (profiled 0.74 cpu-s serial at sf0.1, guide §2.5 "input skew —
    // repartition immediately after the read"); one narrow shuffle of
    // (doc_id, text) buys full-width parallelism for the heavy
    // per-token work at any scale.
    // scan-width-gated spread (r19): see Tables.spreadByKey
    Tables.spreadByKey(Tables.documents(spark, d)
        .select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
  }

  /** C1: exact dedup — hash-groupBy on md5(text), keep the min doc id. */
  def dedupExact(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("text_hash"))
  }

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin

  /** C2: n-gram Jaccard near-dup pairs. Shingle-explode + equi-join on the
    * shingle (blocking key) — never an all-pairs product; Jaccard from
    * integer counts is cross-engine exact. */
  def dedupNgramJaccard(spark: SparkSession, d: String): DataFrame = {
    // 8-byte hash as the blocking key (same pair counts as the string,
    // 64-bit collisions ~1e-8, cheaper to shuffle), then ONE shuffle
    // grouping doc-lists per shingle and exploding pair combinations —
    // ~35% faster than the two-sided self-join. A pathological hot
    // shingle would make one doc-list row huge; the df-capped scale path
    // (NgramDedup.scalablePairs) bounds that at 100 TB.
    // anchored (r19): sh feeds BOTH the per-doc size aggregate and the
    // blocking cells — un-anchored, the whole tokenize+shingle+explode
    // pipeline (the dominant per-row cost) ran twice. One (doc_id,
    // hash) materialization instead (guide §2.4).
    val sh = shingles(spark, d)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      .localCheckpoint()
    // sz attaches to both pair endpoints — anchored for the same
    // reason as sh (the per-doc count over the shingle anchor would
    // otherwise run twice)
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val cells = sh.groupBy(col("sh")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairs = cells
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    pairs
      .join(sz.select(col("doc_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sz.select(col("doc_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard", col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard")
      .orderBy(col("id_a"), col("id_b"))
  }

  val dedupNgramJaccardSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))) AS shingle
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |      GROUP BY a.doc_id, b.doc_id)
      |SELECT id_a, id_b, common, sa.n AS n_a, sb.n AS n_b,
      |       CAST(common AS DOUBLE)/(sa.n + sb.n - common) AS jaccard
      |FROM p JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |WHERE CAST(common AS DOUBLE)/(sa.n + sb.n - common) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** C3: minhash signatures (4 portable hash functions over 3-gram
    * shingles) + 2 LSH band buckets. Pair generation joins on band
    * equality (see MinHashLsh in the library); signatures here are the
    * oracle-checkable part. */
  def dedupMinhash(spark: SparkSession, d: String): DataFrame = {
    // one md5 per shingle; the four hash functions are disjoint 32-bit
    // lanes of the digest (portable, and 4x cheaper than per-seed md5)
    val sh = shingles(spark, d).withColumn("m", md5(col("shingle")))
    def mh(k: Int): Column =
      min(conv(substring(col("m"), 1 + 8 * (k - 1), 8), 16, 10).cast("long"))
    val sig = sh.groupBy(col("doc_id")).agg(
      mh(1).as("mh1"), mh(2).as("mh2"), mh(3).as("mh3"), mh(4).as("mh4"))
    sig.select(col("doc_id"), col("mh1"), col("mh2"), col("mh3"), col("mh4"),
        ((col("mh1") * 31 + col("mh2")) % 7919).as("band1"),
        ((col("mh3") * 31 + col("mh4")) % 7919).as("band2"))
      .orderBy(col("doc_id"))
  }

  val dedupMinhashSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))) AS shingle
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |sig AS (
      |  SELECT doc_id,
      |   MIN(CAST('0x' || substr(m, 1, 8) AS BIGINT)) AS mh1,
      |   MIN(CAST('0x' || substr(m, 9, 8) AS BIGINT)) AS mh2,
      |   MIN(CAST('0x' || substr(m, 17, 8) AS BIGINT)) AS mh3,
      |   MIN(CAST('0x' || substr(m, 25, 8) AS BIGINT)) AS mh4
      |  FROM (SELECT doc_id, md5(shingle) AS m FROM sh) GROUP BY doc_id)
      |SELECT doc_id, mh1, mh2, mh3, mh4,
      |       (mh1 * 31 + mh2) % 7919 AS band1,
      |       (mh3 * 31 + mh4) % 7919 AS band2
      |FROM sig ORDER BY doc_id""".stripMargin

  /** C4: 32-bit simhash per document from per-token md5-derived hashes. */
  def dedupSimhash(spark: SparkSession, d: String): DataFrame = {
    val tok = Tables.spreadByKey(Tables.documents(spark, d)
        .select(col("doc_id"), col("text")), "doc_id") // gated — see shingles
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", md5Hash(col("tok"), 1, 8))
    val bits = tok
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(31))).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(when(expr("shiftright(h, b) & 1") === 1, 1).otherwise(-1)).as("s"))
    bits.groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L)).as("simhash"))
      .orderBy(col("doc_id"))
  }

  val dedupSimhashSql: String =
    """WITH tok AS (
      |  SELECT doc_id, CAST('0x' || substr(md5(t.tok), 1, 8) AS BIGINT) AS h
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t),
      |bits AS (
      |  SELECT doc_id, b.b,
      |         SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM tok CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b
      |  GROUP BY doc_id, b.b)
      |SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
      |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** C5: embedding-cosine near-dup pairs. Dot/norm via left-fold in array
    * order (deterministic, bit-identical to DuckDB's list_reduce). At
    * scale candidates come from LSH buckets — `Similarity.lshNearDupPairs`
    * is the production form (equality-tested against this oracle); the
    * small-SF oracle keys the join on the id inequality only. */
  def dedupEmbedCos(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"),
        VecDot.vecNorm(col("embedding")).as("nrm"))
    // stream side spread across cores (r18): the embeddings table is a
    // single parquet row group, so the nested-loop pair verification —
    // the dominant cost of this small-SF oracle twin — ran in ONE task
    // (profiled: two sequential 0.8 cpu-s single-task stages); the
    // broadcast side stays as-is
    val a = Tables.spreadByKey(e, "vec_id") // gated (r19) — see Tables
      .select(col("vec_id").as("id_a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", VecDot.cosine(col("ea"), col("na"), col("eb"), col("nb")))
      .filter(col("cos") >= 0.45)
      .select("id_a", "id_b", "cos")
      .orderBy(col("id_a"), col("id_b"))
  }

  val dedupEmbedCosSql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |         sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |       list_reduce(list_transform(list_zip(a.embedding, b.embedding), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (x, y) -> x + y) / (a.nrm * b.nrm) AS cos
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE list_reduce(list_transform(list_zip(a.embedding, b.embedding), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.45
      |ORDER BY id_a, id_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact _,
    "dedup_ngram_jaccard" -> dedupNgramJaccard _,
    "dedup_minhash" -> dedupMinhash _,
    "dedup_simhash" -> dedupSimhash _,
    "dedup_embed_cos" -> dedupEmbedCos _)

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_minhash" -> dedupMinhashSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_embed_cos" -> dedupEmbedCosSql)
}
