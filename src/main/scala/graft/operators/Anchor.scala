package graft.operators

import org.apache.spark.sql.DataFrame

/** How iterative operators truncate lineage between rounds.
  *
  * Iterative DataFrame algorithms (PageRank, connected components,
  * k-hop BFS, incremental dedup) MUST break lineage every round or
  * plans grow without bound — analysis time explodes and any retry
  * recomputes every prior round. Spark gives two honest ways to break
  * it, with opposite failure semantics at cluster scale:
  *
  *  - [[Anchor.Local]] — `localCheckpoint(eager = true)`: blocks live
  *    ONLY on executors. Fast (no distributed-FS round trip) and fully
  *    correct on a single-JVM `local[n]` run, but on a real cluster a
  *    single executor loss makes every downstream stage unrecoverable:
  *    Spark cannot recompute truncated lineage, so a 100 TB PageRank
  *    dies at iteration 40 with `Checkpoint block ... not found`. The
  *    right default for local/bench runs, and ONLY for those.
  *  - [[Anchor.Reliable]] — `checkpoint(eager = true)` into a reliable
  *    filesystem directory (HDFS/S3/NFS): iteration state survives
  *    executor loss and the job resumes at stage granularity. Costs one
  *    write+read of the anchored frame per round — the insurance
  *    premium a long iteration on a real cluster should always pay.
  *
  * Both modes are eager and both truncate lineage, so results are
  * bit-identical (spec-pinned on the pagerank gate); only the failure
  * story differs. Every iterative operator in this package takes an
  * `anchor: Anchor = Anchor.Local` parameter — pass
  * `Anchor.Reliable(dir)` when running on a cluster.
  */
sealed trait Anchor {
  def apply(df: DataFrame): DataFrame
}

object Anchor {

  /** Executor-resident truncation — local-mode default. */
  case object Local extends Anchor {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
  }

  /** Postfix form: `df.anchored(anchor)` — keeps call sites reading
    * like the `.localCheckpoint(true)` chains they replace. */
  implicit class AnchorOps(private val df: DataFrame) extends AnyVal {
    def anchored(a: Anchor): DataFrame = a(df)
  }

  /** Reliable-FS truncation: survives executor loss. `dir` must be a
    * cluster-visible path (HDFS/S3/NFS); the SparkContext checkpoint
    * dir is set on first use and reused while it still points inside
    * `dir` (Spark appends a per-context UUID subdirectory).
    *
    * Storage lifecycle: `df.checkpoint` writes per-anchor state that
    * Spark reclaims ONLY when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (off by
    * default) — without it, a long multi-iteration run accumulates one
    * directory per anchored round for the life of the SparkContext.
    * Set that conf on any cluster session that runs iterative
    * operators under Reliable, or reclaim `dir` between jobs; the
    * checkpoint data has no value once the job that wrote it ends. */
  final case class Reliable(dir: String) extends Anchor {
    require(dir.nonEmpty, "Anchor.Reliable needs a checkpoint directory")
    def apply(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      val want = new org.apache.hadoop.fs.Path(dir.stripSuffix("/"))
      val wantFs = want.getFileSystem(sc.hadoopConfiguration)
      // setCheckpointDir stores the FULLY-QUALIFIED d/<uuid> path, so
      // compare fully-qualified URIs (scheme + authority + path), not
      // just the path component: file:/ckpt vs hdfs://nn/ckpt share a
      // path but are different filesystems, and treating one as the
      // other sends checkpoints to the wrong FS — silently forfeiting
      // the executor-loss durability this mode exists for. (Exact
      // parent match, never substring: a sibling directory's cleanup
      // must not be able to delete live blocks mid-iteration.)
      val wantUri = wantFs.makeQualified(want).toUri
      val alreadyOurs = sc.getCheckpointDir.exists { c =>
        val parent = new org.apache.hadoop.fs.Path(c).getParent
        parent != null &&
          parent.getFileSystem(sc.hadoopConfiguration)
            .makeQualified(parent).toUri == wantUri
      }
      if (!alreadyOurs) sc.setCheckpointDir(want.toString)
      df.checkpoint(eager = true)
    }
  }
}
