package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** G29: resumable staged curation — checkpoint-per-stage execution of a
  * curation chain with a lineage manifest.
  *
  * At 100 TB a curation run is hours of cluster time across many
  * stages (repair → gates → dedup → decontaminate → …). Composing them
  * as one lazy plan has two failure modes at that scale: a single
  * mega-plan whose any-task failure restarts everything, and zero
  * visibility into WHERE the corpus shrank when the output looks wrong
  * (the CCNet/Dolma pipelines both publish per-stage reduction
  * numbers for exactly this reason). This runner materializes every
  * stage to parquet and COMMITS it with the repo's `_meta` protocol
  * (ModelStore's temp + atomic-rename convention — the marker is
  * written after the data, so a crash mid-write leaves an uncommitted
  * directory that the next run recomputes, never half-reads), records
  * a per-stage lineage report (rows in/out, wall seconds, reused or
  * computed), and on re-run SKIPS every committed stage — recovery
  * costs O(the stage that failed), not O(pipeline).
  *
  * Checkpointing is also the lineage-truncation move the iterative
  * operators (DedupClusters, SemDedup) already make inside one job,
  * applied at the pipeline grain: each stage's `fn` receives a frame
  * read FROM the previous stage's parquet, so no stage re-executes its
  * predecessors' work through a shared lazy plan.
  *
  * Resume contract (make-style): a stage's directory embeds its INDEX
  * and NAME, so renaming or reordering stages lands in a fresh
  * uncommitted directory and recomputes from there — stale identity
  * reuse is impossible by construction. Reuse covers exactly the
  * longest committed PREFIX: once any stage recomputes, every
  * downstream stage recomputes too, even if committed — a reused
  * output must never sit on a recomputed input (deterministic fns
  * would get away with it; the runner does not bet the corpus on
  * that). Changing a stage's IMPLEMENTATION under an unchanged name is
  * invisible (a closure has no stable hash); bump the name
  * (`gate_v2`) — the contract every artifact store in this repo pins.
  */
object CurationRun {

  /** One stage: a validated name (it becomes a path component and the
    * resume identity) and the frame transform. */
  final case class Stage(name: String, fn: DataFrame => DataFrame) {
    require(name.matches("[A-Za-z0-9_\\-]{1,64}"),
      s"stage name '$name' must be [A-Za-z0-9_-]{1,64} — it is a path " +
        "component and the resume identity")
  }

  final case class StageReport(stage: String, rowsIn: Long, rowsOut: Long,
      wallSec: Double, reused: Boolean) {
    def dropped: Long = rowsIn - rowsOut
  }

  private def stageDir(workDir: String, i: Int, name: String): String =
    s"$workDir/stage_${i}_$name"

  /** Run (or resume) the chain. Returns the final frame — read from
    * the last stage's committed parquet — and the per-stage lineage.
    * Also writes `workDir/manifest.json` describing this run. */
  def run(spark: SparkSession, input: DataFrame, stages: Seq[Stage],
      workDir: String): (DataFrame, Seq[StageReport]) = {
    require(stages.nonEmpty, "at least one stage")
    require(stages.map(_.name).distinct.size == stages.size,
      "duplicate stage names — each stage needs its own resume identity")
    val reports = scala.collection.mutable.ArrayBuffer.empty[StageReport]
    var cur = input
    var rowsIn = -1L // computed lazily: only if the first stage runs
    var prefixIntact = true // false once any stage recomputed
    stages.zipWithIndex.foreach { case (st, i) =>
      val dir = stageDir(workDir, i, st.name)
      val committed =
        if (prefixIntact && metaExists(spark, dir)) {
          val kv = ModelStore.readMeta(spark, dir, "curation stage")
          // structural by construction (index+name are in the path);
          // defensive against hand-edited markers
          require(kv.getOrElse("kind", "?") == "curation_stage" &&
            kv.getOrElse("stage", "?") == st.name &&
            kv.getOrElse("index", "?") == i.toString,
            s"marker at $dir does not describe stage $i '${st.name}' — " +
              "hand-edited workDir; clear it")
          Some(kv)
        } else None
      committed match {
        case Some(kv) =>
          reports += StageReport(st.name, kv("rows_in").toLong,
            kv("rows_out").toLong, kv("wall_ms").toLong / 1e3,
            reused = true)
          cur = kv.get("schema") match {
            case Some(j) => readStage(spark, dir,
              org.apache.spark.sql.types.DataType.fromJson(j)
                .asInstanceOf[org.apache.spark.sql.types.StructType])
            // marker from a pre-schema version: infer (non-empty dirs
            // only existed then)
            case None => spark.read.parquet(s"$dir/data")
          }
          rowsIn = kv("rows_out").toLong
        case None =>
          prefixIntact = false
          // DECERTIFY before recompute: a committed stage recomputing
          // because an upstream stage broke the prefix still has its
          // stale `_meta` marker on disk. Overwriting `$dir/data` under
          // that marker would let a crash mid-recompute leave new or
          // partial data certified by the OLD marker — which the next
          // run's checks would happily reuse. Deleting the marker FIRST
          // restores the invariant the protocol rests on: a crash
          // anywhere inside recompute leaves an uncommitted directory.
          if (metaExists(spark, dir)) {
            val p = ModelStore.metaPath(dir)
            p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(p, false)
          }
          val t0 = System.nanoTime()
          if (rowsIn < 0) rowsIn = cur.count()
          val out = st.fn(cur)
          out.write.mode("overwrite").parquet(s"$dir/data")
          val result = readStage(spark, dir, out.schema)
          val rowsOut = result.count()
          val wall = (System.nanoTime() - t0) / 1e9
          // marker LAST — it IS the commit (ModelStore convention).
          // The schema rides the marker so an ALL-ROWS-DROPPED stage
          // (a legitimate gate outcome) stays readable on resume: an
          // empty parquet directory has no inferable schema of its own.
          ModelStore.writeMeta(spark, dir, Seq(
            "kind" -> "curation_stage", "stage" -> st.name,
            "index" -> i.toString, "rows_in" -> rowsIn.toString,
            "rows_out" -> rowsOut.toString,
            "schema" -> out.schema.json,
            // integer millis: locale-proof to write and parse back
            "wall_ms" -> math.round(wall * 1000).toString))
          reports += StageReport(st.name, rowsIn, rowsOut, wall,
            reused = false)
          cur = result
          rowsIn = rowsOut
      }
    }
    writeManifest(spark, workDir, reports.toSeq)
    (cur, reports.toSeq)
  }

  /** Read a stage's data dir, tolerating the zero-row case: a stage
    * that drops everything writes only a _SUCCESS marker, which parquet
    * cannot infer a schema from — the committed schema fills in. */
  private def readStage(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    try {
      val df = spark.read.schema(schema).parquet(s"$dir/data")
      df.queryExecution.analyzed // force resolution now, not downstream
      df
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  private def metaExists(spark: SparkSession, dir: String): Boolean = {
    val p = ModelStore.metaPath(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Human/tool-readable run report (an OUTPUT, not a commit point —
    * the per-stage `_meta` markers carry the resume state). */
  private def writeManifest(spark: SparkSession, workDir: String,
      reports: Seq[StageReport]): Unit = {
    val body = reports.map { r =>
      s"""{"stage":"${r.stage}","rows_in":${r.rowsIn},""" +
        s""""rows_out":${r.rowsOut},"dropped":${r.dropped},""" +
        s""""wall_ms":${math.round(r.wallSec * 1000)},"reused":${r.reused}}"""
    }.mkString("[\n  ", ",\n  ", "\n]\n")
    val p = new Path(s"$workDir/manifest.json")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
