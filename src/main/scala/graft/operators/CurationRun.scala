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
    // commit-mode probe BEFORE any stage runs (review wave r17): the
    // run manifest is written LAST, and a knob/manifest mode mismatch
    // must refuse up front, not after hours of stages. (Stage markers
    // need no probe: a recompute decertifies — deletes — its marker
    // before rewriting, so they can never mode-mix.)
    BatchedState.assertPointerWritable(spark,
      new Path(s"$workDir/manifest.json"))
    val reports = scala.collection.mutable.ArrayBuffer.empty[StageReport]
    var cur = input
    var rowsIn = -1L // computed lazily: only if the first stage runs
    var prefixIntact = true // false once any stage recomputed
    stages.zipWithIndex.foreach { case (st, i) =>
      val dir = stageDir(workDir, i, st.name)
      // readMetaOpt: an absent marker AND a torn-first-commit manifest
      // directory both read as uncommitted (recompute), the pointer
      // protocol's unpublished semantics
      val committed =
        if (prefixIntact) ModelStore.readMetaOpt(spark, dir).map { kv =>
          // structural by construction (index+name are in the path);
          // defensive against hand-edited markers
          require(kv.getOrElse("kind", "?") == "curation_stage" &&
            kv.getOrElse("stage", "?") == st.name &&
            kv.getOrElse("index", "?") == i.toString,
            s"marker at $dir does not describe stage $i '${st.name}' — " +
              "hand-edited workDir; clear it")
          kv
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
          // (deleteMeta is recursive — a manifest-mode marker is a
          // directory of numbered manifests.)
          ModelStore.deleteMeta(spark, dir)
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
    writeManifest(spark, workDir, reports.toSeq,
      stages.zipWithIndex.map { case (st, i) => s"stage_${i}_${st.name}" })
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

  /** Human/tool-readable run report AND the GC's liveness reference
    * (see [[gc]]) — committed through the knob-governed pointer
    * protocol (r17: rename mode keeps the temp + atomic-replace swap;
    * `spark.graft.commit.mode=manifest` commits create-new numbered
    * manifests with zero renames), so a crash mid-write can never
    * leave a truncated manifest that a later GC would misread as
    * "nothing is live". The per-stage `_meta` markers still carry the
    * RESUME state; the manifest records which directories the LAST
    * run touched. */
  private def writeManifest(spark: SparkSession, workDir: String,
      reports: Seq[StageReport], dirs: Seq[String]): Unit = {
    val body = reports.zip(dirs).map { case (r, d) =>
      s"""{"stage":"${r.stage}","dir":"$d","rows_in":${r.rowsIn},""" +
        s""""rows_out":${r.rowsOut},"dropped":${r.dropped},""" +
        s""""wall_ms":${math.round(r.wallSec * 1000)},"reused":${r.reused}}"""
    }.mkString("[\n  ", ",\n  ", "\n]\n")
    BatchedState.writePointer(spark,
      new Path(s"$workDir/manifest.json"), body)
  }

  // ---- DAG execution (r11 directive 8) --------------------------------------

  /** One DAG stage: named inputs instead of a single upstream. `deps`
    * name either entries of the run's `inputs` map or other stages;
    * `fn` receives exactly those frames keyed by dep name. Identity
    * for resume is (name, sorted deps) — changing either lands in a
    * fresh/invalidated directory; changing the IMPLEMENTATION under an
    * unchanged name is invisible, bump the name (the linear contract). */
  final case class DagStage(name: String, deps: Seq[String],
      fn: Map[String, DataFrame] => DataFrame) {
    require(name.matches("[A-Za-z0-9_\\-]{1,64}"),
      s"stage name '$name' must be [A-Za-z0-9_-]{1,64}")
    require(deps.nonEmpty, s"stage '$name' needs at least one dep")
    require(deps.distinct.size == deps.size,
      s"stage '$name' lists a duplicate dep")
  }

  private def dagDir(workDir: String, name: String): String =
    s"$workDir/dag_$name"

  /** Run (or resume) a DAG of stages over named `inputs`. Fan-in and
    * fan-out are first-class: a diamond (A → B, A → C, {B,C} → D)
    * recomputes only the invalidated cone — B's crash leaves A
    * committed, and the re-run reuses A, recomputes B, reuses C (its
    * own deps intact), recomputes D (it sits on a recomputed input).
    * The reuse rule generalizes the linear longest-committed-prefix:
    * a stage reuses iff its marker matches (name + deps) AND every dep
    * stage was itself reused — a reused output never sits on a
    * recomputed input. Inputs are the run's roots and count as intact
    * (the same trust the linear form places in `input`). Returns every
    * stage's frame by name plus the lineage reports in topological
    * order. */
  def runDag(spark: SparkSession, inputs: Map[String, DataFrame],
      stages: Seq[DagStage], workDir: String)
      : (Map[String, DataFrame], Seq[StageReport]) = {
    require(stages.nonEmpty, "at least one stage")
    require(stages.map(_.name).distinct.size == stages.size,
      "duplicate stage names")
    // up-front mode probe — see run()
    BatchedState.assertPointerWritable(spark,
      new Path(s"$workDir/manifest.json"))
    val stageNames = stages.map(_.name).toSet
    require(inputs.keySet.intersect(stageNames).isEmpty,
      s"stage names shadow inputs: ${inputs.keySet.intersect(stageNames)}")
    stages.foreach(s => s.deps.foreach(d =>
      require(inputs.contains(d) || stageNames(d),
        s"stage '${s.name}' depends on unknown '$d'")))
    // Kahn topological order; cycles refuse loudly
    val byName = stages.map(s => s.name -> s).toMap
    val order = scala.collection.mutable.ArrayBuffer.empty[DagStage]
    val done = scala.collection.mutable.Set.empty[String] ++ inputs.keySet
    var remaining = stages
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.deps.forall(done))
      require(ready.nonEmpty,
        s"dependency cycle among: ${blocked.map(_.name).mkString(", ")}")
      ready.foreach { s => order += s; done += s.name }
      remaining = blocked
    }
    val frames =
      scala.collection.mutable.Map.empty[String, DataFrame] ++ inputs
    // inputs are intact roots
    val reused =
      scala.collection.mutable.Set.empty[String] ++ inputs.keySet
    val reports = scala.collection.mutable.ArrayBuffer.empty[StageReport]
    order.foreach { st =>
      val dir = dagDir(workDir, st.name)
      val depKey = st.deps.sorted.mkString(",")
      val committed =
        if (st.deps.forall(reused))
          ModelStore.readMetaOpt(spark, dir).filter(kv =>
            kv.getOrElse("kind", "?") == "curation_dag_stage" &&
              kv.getOrElse("stage", "?") == st.name &&
              kv.getOrElse("deps", "?") == depKey) // else stale identity
        else None
      committed match {
        case Some(kv) =>
          reports += StageReport(st.name, kv("rows_in").toLong,
            kv("rows_out").toLong, kv("wall_ms").toLong / 1e3,
            reused = true)
          frames(st.name) = readStage(spark, dir,
            org.apache.spark.sql.types.DataType.fromJson(kv("schema"))
              .asInstanceOf[org.apache.spark.sql.types.StructType])
          reused += st.name
        case None =>
          // decertify BEFORE recompute (the linear-path invariant)
          ModelStore.deleteMeta(spark, dir)
          val t0 = System.nanoTime()
          val depFrames = st.deps.map(d => d -> frames(d)).toMap
          val rowsIn = depFrames.valuesIterator.map(_.count()).sum
          val out = st.fn(depFrames)
          out.write.mode("overwrite").parquet(s"$dir/data")
          val result = readStage(spark, dir, out.schema)
          val rowsOut = result.count()
          val wall = (System.nanoTime() - t0) / 1e9
          ModelStore.writeMeta(spark, dir, Seq(
            "kind" -> "curation_dag_stage", "stage" -> st.name,
            "deps" -> depKey, "rows_in" -> rowsIn.toString,
            "rows_out" -> rowsOut.toString, "schema" -> out.schema.json,
            "wall_ms" -> math.round(wall * 1000).toString))
          reports += StageReport(st.name, rowsIn, rowsOut, wall,
            reused = false)
          frames(st.name) = result
      }
    }
    writeManifest(spark, workDir, reports.toSeq,
      order.map(s => s"dag_${s.name}").toSeq)
    ((frames -- inputs.keySet).toMap, reports.toSeq)
  }

  // ---- checkpoint GC ---------------------------------------------------------

  /** Delete superseded stage directories: every `stage_*` / `dag_*`
    * directory under `workDir` that the LIVE manifest (the last
    * completed run's, written atomically) does not reference. Renamed
    * or removed stages leave orphan checkpoints forever otherwise —
    * the retention gap G29 shipped with. Refuses without a readable
    * manifest (no liveness reference → nothing is provably dead) and
    * never touches a directory the manifest names, committed or not.
    * Returns the deleted directory names. */
  def gc(spark: SparkSession, workDir: String): Seq[String] = {
    val root = new Path(workDir)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new Path(s"$workDir/manifest.json")
    // readPointer: legacy bare-JSON manifests parse through; an absent
    // pointer AND a torn-first-commit manifest dir both read as "no
    // liveness reference" — gc refuses rather than guessing
    val text = BatchedState.readPointer(spark, mp).getOrElse(
      throw new IllegalArgumentException(
        s"requirement failed: no manifest.json at $workDir — run the " +
          "pipeline before gc (the manifest is the liveness reference)"))
    // live dirs: the "dir" fields of the manifest (written by this
    // object). Legacy manifests (pre-"dir") refuse: their entries name
    // stages but not directories, and guessing is how GC eats data.
    val dirRe = """"dir":"([^"]+)"""".r
    val live = dirRe.findAllMatchIn(text).map(_.group(1)).toSet
    require(live.nonEmpty,
      s"manifest at $workDir carries no dir entries (legacy or " +
        "truncated) — re-run the pipeline to refresh it before gc")
    val victims = f.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        (s.getPath.getName.startsWith("stage_") ||
          s.getPath.getName.startsWith("dag_")) &&
        !live(s.getPath.getName))
    victims.foreach(s => f.delete(s.getPath, true))
    victims.map(_.getPath.getName)
  }
}
