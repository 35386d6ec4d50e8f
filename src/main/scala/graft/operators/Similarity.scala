package graft.operators

import graft.Tables
import org.apache.spark.sql.graft.VecDot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY §2 D1–D2).
  *
  * D1 is the exact brute-force baseline: a query subset (2% of vectors)
  * against all candidates, cosine via deterministic left-fold, top-k by
  * (cos DESC, neighbor_id) so ranks are total-ordered. The candidate side
  * streams — only the (small) query side is broadcast, so at 100 TB the
  * scan parallelizes over candidates with no shuffle until the per-query
  * top-k (a partial top-k per partition via the window on query_id).
  *
  * D2 is the scale path: 16-bit random-hyperplane LSH sketches from
  * seeded md5-derived pseudo-random planes; ANN candidates join on bucket
  * equality instead of crossing.
  */
object Similarity {
  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      VecDot.vecNorm(col("embedding")).as("nrm"))

  /** D1: exact top-5 cosine neighbors for each query vector. */
  def simTopkExact(spark: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, d))
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"), col("nrm").as("nq"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ec"), col("nrm").as("nc"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VecDot.cosine(col("eq"), col("nq"), col("ec"), col("nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "cos")
      .orderBy(col("query_id"), col("rank"))
  }

  val simTopkExactSql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |         sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
      |  FROM embeddings),
      |p AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         list_reduce(list_transform(list_zip(q.embedding, c.embedding), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (x, y) -> x + y) / (q.nrm * c.nrm) AS cos
      |  FROM n q JOIN n c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
      |r AS (SELECT query_id, neighbor_id, cos,
      |             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |      FROM p)
      |SELECT query_id, neighbor_id, rank, cos
      |FROM r WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** D2: random-hyperplane LSH sketch (16 planes, seeded md5-derived
    * coefficients) + bucketed ANN candidates. The plane coefficients are
    * pseudo-random in {-1,+1} from the portable md5 hash of (plane, dim),
    * so the sketch itself is oracle-checkable. */
  /** sign(p, dim) = +1 if the md5-derived bit of "p:dim" is even else -1 —
    * the same constant the oracle derives in SQL; precomputed here so the
    * per-row work is 16 codegen'd VecDots against literal ±1 arrays
    * instead of 1024 md5 calls inside a lambda. x*(+1.0f)=x and
    * x*(-1.0f)=-x exactly, so results stay bit-identical to the oracle. */
  private def planeSign(p: Int, i: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2 == 0) 1.0f else -1.0f
  }

  def simLshSketch(spark: SparkSession, d: String): DataFrame = {
    val dims = 64
    val planes = (0 until 16).map { p =>
      val signs = array((0 until dims).map(i => lit(planeSign(p, i))): _*)
      when(VecDot.vecDot(col("embedding"), signs) > 0, shiftleft(lit(1L), p))
        .otherwise(lit(0L))
    }
    Tables.embeddings(spark, d)
      .select(col("vec_id"), planes.reduce(_ + _).as("bucket"))
      .orderBy(col("vec_id"))
  }

  val simLshSketchSql: String = {
    val terms = (0 until 16).map { p =>
      s"""(CASE WHEN list_reduce(list_transform(list_zip(embedding, range(0, len(embedding))),
         |  s -> CASE WHEN (CAST('0x' || substr(md5('$p:' || CAST(s[2] AS VARCHAR)), 1, 8) AS BIGINT) % 2) = 0
         |       THEN CAST(s[1] AS DOUBLE) ELSE -CAST(s[1] AS DOUBLE) END), (x, y) -> x + y) > 0
         | THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)""".stripMargin
    }.mkString(" + ")
    s"""SELECT vec_id, $terms AS bucket
       |FROM embeddings
       |ORDER BY vec_id""".stripMargin
  }

  /** The 100 TB path for C5 (threshold-PAIR embedding near-dup, the
    * production counterpart of the quarantined all-pairs oracle form):
    * multi-table random-hyperplane LSH candidates + exact cosine verify.
    *
    * A pair is a candidate iff it shares at least one (table, bucket)
    * cell from [[AnnSearch.sketchCells]] — a plain equi-join on the cell
    * key, never an all-pairs product; hot cells split under AQE. Exact
    * cosine then verifies ONLY the candidates, so false positives are
    * impossible; the sketch controls recall alone. A hyperplane agrees
    * with a pair at angle θ with P = 1 − θ/π, so recall at threshold t is
    * 1 − (1 − p^planes)^tables with p = 1 − arccos(t)/π — the defaults
    * (24 tables × 4 planes) give ≥ 0.99 at t = 0.45 and higher above it;
    * raise `planesPerTable` (finer buckets) as the corpus grows and add
    * tables to hold recall. Embeddings never ride the candidate shuffle:
    * cells carry (id, table_idx, bucket) only, and the float arrays
    * re-attach by keyed join after the candidate dedup.
    *
    * Run it over exact-dedup representatives (DedupPipeline's convention)
    * so identical-vector families don't inflate bucket fan-out. */
  def lshNearDupPairs(vecs: DataFrame, id: String, dims: Int, threshold: Double,
      tables: Int = 24, planesPerTable: Int = 4): DataFrame = {
    val cells = AnnSearch.sketchCells(vecs, id, dims, tables, planesPerTable)
    val a = cells.select(col(id).as("id_a"), col("table_idx"), col("bucket"))
    val b = cells.select(col(id).as("id_b"), col("table_idx"), col("bucket"))
    val candIds = a.join(b, Seq("table_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val e = vecs.select(col(id), col("embedding"),
      VecDot.vecNorm(col("embedding")).as("nrm"))
    candIds
      .join(e.select(col(id).as("id_a"), col("embedding").as("ea"), col("nrm").as("na")), Seq("id_a"))
      .join(e.select(col(id).as("id_b"), col("embedding").as("eb"), col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cos", VecDot.cosine(col("ea"), col("na"), col("eb"), col("nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_exact" -> simTopkExact _,
    "sim_lsh_sketch" -> simLshSketch _)

  val oracles: Map[String, String] = Map(
    "sim_topk_exact" -> simTopkExactSql,
    "sim_lsh_sketch" -> simLshSketchSql)
}
