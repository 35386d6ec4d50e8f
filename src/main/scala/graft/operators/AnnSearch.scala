package graft.operators

import org.apache.spark.sql.graft.VecDot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search — the cluster-scale path for D1.
  *
  * Multi-table random-hyperplane LSH: `tables` independent sketches of
  * `planesPerTable` seeded hyperplanes each. A candidate is any vector
  * sharing at least one (table, bucket) cell with the query; exact cosine
  * then ranks only the candidates. Probe cost per query is O(candidates)
  * instead of O(n); the bucket join is a plain equi-join on
  * (table_idx, bucket) so it shuffles by cell and AQE splits hot cells.
  * More tables → higher recall, more candidates. Defaults (6 tables × 4
  * planes) are tuned for near-orthogonal random vectors — the hardest
  * case; clustered real embeddings allow more planes and harder pruning.
  */
object AnnSearch {
  private def planeSign(table: Int, p: Int, i: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$table:$p:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2 == 0) 1.0f else -1.0f
  }

  /** (id, table_idx, bucket) cells for every vector — ids and bucket
    * keys only, so downstream bucket joins and candidate dedup shuffle a
    * few bytes per cell instead of the embedding arrays. */
  def sketchCells(vecs: DataFrame, id: String, dims: Int,
      tables: Int, planesPerTable: Int): DataFrame = {
    // Codegen-size discipline: each table's plane matrix rides the plan
    // as ONE typedLit object reference (generated code indexes
    // `references[]`), never as tables×planes×dims inline constants —
    // the r11 sizing (24 tables × 15 planes × 64 dims ≈ 23k literals)
    // pushed the generated projection past the JVM's 64 KB method limit
    // and the whole stage fell back to interpreted execution. The
    // bucket is assembled by a runtime fold over planes (descending, so
    // acc·2 + bit reproduces Σ bit_p·2^p exactly): generated code is
    // O(tables), independent of planes and dims, and the per-row
    // arithmetic (one vecDot per plane, one shifted add) is unchanged.
    val cells = (0 until tables).map { t =>
      val planesLit = typedLit((0 until planesPerTable).map(p =>
        (0 until dims).map(i => planeSign(t, p, i))))
      val bucket = aggregate(
        sequence(lit(planesPerTable - 1), lit(0), lit(-1)),
        lit(0L),
        (acc, p) => acc * 2 + when(
          VecDot.vecDot(col("embedding"),
            element_at(planesLit, p + 1)) > 0, lit(1L)).otherwise(lit(0L)))
      struct(lit(t).as("table_idx"), bucket.as("bucket"))
    }
    vecs.select(col(id), explode(array(cells: _*)).as("cell"))
      .select(col(id), col("cell.table_idx"), col("cell.bucket"))
  }

  /** Approximate top-k neighbors for each query vector. The multi-table
    * candidate dedup runs on (query_id, neighbor_id) id pairs only; the
    * float arrays are re-attached AFTER dedup — query embeddings by
    * broadcast (the query side is small by construction), corpus
    * embeddings by one keyed join against the deduped candidates. */
  def annTopK(vecs: DataFrame, queries: DataFrame, id: String, dims: Int,
      k: Int, tables: Int = 6, planesPerTable: Int = 4): DataFrame = {
    val corpusCells = sketchCells(vecs, id, dims, tables, planesPerTable)
      .select(col(id).as("neighbor_id"), col("table_idx"), col("bucket"))
    val probeCells = sketchCells(queries, id, dims, tables, planesPerTable)
      .select(col(id).as("query_id"), col("table_idx"), col("bucket"))
    val candIds = probeCells.join(corpusCells, Seq("table_idx", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val cands = candIds
      .join(broadcast(queries.select(col(id).as("query_id"),
        col("embedding").as("eq"))), Seq("query_id"))
      .join(vecs.select(col(id).as("neighbor_id"),
        col("embedding").as("ec")), Seq("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .withColumn("cos", VecDot.vecDot(col("eq"), col("ec")) /
        (VecDot.vecNorm(col("eq")) * VecDot.vecNorm(col("ec"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
