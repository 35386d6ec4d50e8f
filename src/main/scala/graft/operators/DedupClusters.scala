package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup cluster consolidation (SURVEY §2 C6): near-dup PAIRS are only
  * half of deduplication — a training-data pipeline must group pairs
  * into connected components and keep one representative per cluster
  * (a↔b and b↔c must collapse to ONE kept doc, not two).
  *
  * Connected components by min-label propagation WITH POINTER-DOUBLING
  * (the classic shortcutting of Shiloach–Vishkin, the same device the
  * MapReduce CC literature — Kiveris et al., SoCC'14 — exists to
  * distribute): every vertex starts labeled with its own id; each
  * round labels flow across edges and every vertex keeps the minimum
  * seen (one edge-keyed join + one keyed aggregation), then labels
  * compose with themselves (`comp ← comp(comp)`, one labels-sized
  * join) so the distance a label has travelled DOUBLES per round.
  * Convergence is O(log diameter) rounds — a 100×-corpus chain of
  * near-dups converges in ~⌈log₂ d⌉ rounds where plain propagation
  * (the pre-r13 implementation) needed d rounds and, worse, exited
  * SILENTLY with wrong labels at its cap. This version drops the
  * linear diameter dependence and refuses loudly if the cap is ever
  * reached. Per round: one O(E) shuffle + one O(V) shuffle — no
  * driver-side graph, no single-partition structure; lineage truncates
  * through [[Anchor]] every round so plans stay flat
  * ([[Anchor.Reliable]] for cluster runs where executor loss must not
  * kill the iteration).
  */
object DedupClusters {

  /** (id, comp) for every vertex appearing in `edges`; comp = min vertex
    * id in the component. Undirected.
    *
    * Refuses loudly (IllegalStateException) if propagation has not
    * converged after `maxIter` rounds — with pointer doubling, 25
    * rounds covers components of diameter > 10⁷; hitting the cap means
    * something is structurally wrong, and silent mislabeling is never
    * acceptable (these labels feed dedup keeper selection and entity
    * resolution).
    *
    * Correctness invariants (each round preserves them): labels only
    * DECREASE; a label is always the id of a node in the same
    * component; propagate-stability (no label changed by an edge pass)
    * forces labels constant per component, and a constant component
    * label can only be the component minimum. The shortcut step only
    * composes labels, so it accelerates without affecting the
    * fixpoint. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, anchor: Anchor = Anchor.Local): DataFrame = {
    require(maxIter >= 1, s"maxIter=$maxIter")
    // anchored once — every propagation round joins against the edge
    // list, and without this each round would recompute the caller's
    // whole pair pipeline (candidate generation, jaccard verify, ...)
    val undWide = anchor(edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      .union(edges
        .select(col(dstCol).cast("long").as("s"), col(srcCol).cast("long").as("d"))))
    // SIZE-ADAPTIVE partitioning (r18, guide §2): the anchored edge
    // list inherits its producer's partition count (union doubles it),
    // and every round's map stages re-pay one task per partition —
    // for a near-dup edge set of a few thousand rows that was ~10× 64-
    // task stages of almost pure per-task overhead. The edge count is
    // already materialized (the anchor is eager), so counting it is a
    // block scan, and coalesce is narrow (no shuffle). ~64k edges per
    // task keeps round work amortized at any scale; large edge sets
    // keep full parallelism (capped by defaultParallelism).
    val npart = math.max(1,
      edges.sparkSession.sparkContext.defaultParallelism)
    val target = math.min(npart.toLong,
      undWide.count() / 65536L + 1L).toInt
    val und =
      if (target < undWide.rdd.getNumPartitions) undWide.coalesce(target)
      else undWide
    var labels = anchor(und.select(col("s").as("id")).distinct()
      .withColumn("comp", col("id")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // propagate: one keyed aggregation computes BOTH the new label
      // and whether it changed — the vertex's own (self-tagged) label
      // rides along as min(when(self)), so no next-vs-prev join is
      // needed, and the convergence flag is a cheap scan of the
      // already-anchored result, not a second join+count job.
      val self = labels.select(col("id"), col("comp"), lit(true).as("_self"))
      val msgs = und.join(labels, und("s") === labels("id"))
        .select(col("d").as("id"), col("comp"), lit(false).as("_self"))
      val next = anchor(self.union(msgs)
        .groupBy(col("id"))
        .agg(min(col("comp")).as("comp"),
          (min(col("comp")) < min(when(col("_self"), col("comp")))).as("_chg")))
      converged = next.filter(col("_chg")).limit(1).isEmpty
      labels =
        if (converged) next.select("id", "comp")
        else {
          // shortcut (pointer doubling): comp ← comp(comp). Every comp
          // value is itself a labeled vertex (labels only ever take
          // existing ids), so the inner join preserves all rows; the
          // hop distance a label covers doubles each round.
          val byId = next.select(col("id").as("_cid"), col("comp").as("_ccomp"))
          anchor(next.select(col("id"), col("comp"))
            .join(byId, col("comp") === col("_cid"))
            .select(col("id"), col("_ccomp").as("comp")))
        }
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter " +
          "propagate+shortcut rounds — refusing to emit possibly wrong " +
          "component labels (raise maxIter; pointer doubling makes 25 " +
          "rounds cover diameter > 10^7)")
    labels
  }

  /** C6 query: every document labeled with its near-dup cluster id
    * (docs with no near-dup keep their own id). Pairs come from the
    * n-gram Jaccard operator; clusters from connected components. */
  def dedupClusters(spark: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.dedupNgramJaccard(spark, d).select("id_a", "id_b")
    val comps = connectedComponents(pairs, "id_a", "id_b")
    Tables.documents(spark, d).select(col("doc_id"))
      .join(comps, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** The recursive-CTE equivalent: labels propagate along the closure of
    * the (bidirectional) near-dup edges; MIN over all reaching sources
    * is the component's minimum id. */
  val dedupClustersSql: String =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))) AS shingle
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |      GROUP BY a.doc_id, b.doc_id),
      |pairs AS (
      |  SELECT id_a, id_b FROM p JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |  WHERE CAST(common AS DOUBLE)/(sa.n + sb.n - common) >= 0.5),
      |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |walk(id, comp) AS (
      |  SELECT DISTINCT s, s FROM edges
      |  UNION
      |  SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.id),
      |cc AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id)
      |SELECT doc_id, COALESCE(comp, doc_id) AS cluster_id
      |FROM documents LEFT JOIN cc ON doc_id = cc.id
      |ORDER BY doc_id""".stripMargin

  /** Keeper selection by SCORE — the Dolma convention applied at the
    * cluster grain: the repo's default keeper is the min-id member
    * (deterministic, content-blind); when a quality score exists, the
    * cluster should keep its BEST member instead (longest / highest-
    * classifier-score — dropping the good copy of a near-dup pair
    * because its id is larger throws away curation signal for free).
    * One map-side-combinable aggregate over (group, id, score): per
    * group, the argmax-score member with ties to the MIN id (the
    * max-struct convention: (score, −id) under MAX makes the smaller
    * id win ties). Returns (groupCol, keep_id, best_score, n_members).
    * NULL scores lose to any non-null score (a member nobody could
    * score never represents a cluster over one somebody could) and
    * tie-break by min id when the whole group is unscored. */
  def keepBest(assigned: DataFrame, groupCol: String, idCol: String,
      scoreCol: String): DataFrame =
    assigned
      .select(col(groupCol), col(idCol).cast("long").as("_id"),
        col(scoreCol).cast("double").as("_s"))
      .groupBy(col(groupCol))
      .agg(max(struct(col("_s").as("s"), (-col("_id")).as("negid")))
          .as("_w"),
        count(lit(1)).as("n_members"))
      .select(col(groupCol), (-col("_w.negid")).as("keep_id"),
        col("_w.s").as("best_score"), col("n_members"))

  /** Gated entry (`dedup_keep_best`): keep-best over exact duplicate
    * groups derived from the corpus — every doc plus an identical-text
    * twin at doc_id+100000 collapses under md5(text), and a
    * deterministic integer score ((doc_id·31) mod 100) differs between
    * the twins, so the argmax is non-trivial in every group (score
    * functions in a real pipeline differ across copies through
    * metadata — source, fetch time — even when text is byte-equal).
    * DuckDB re-derives the keeper with a row_number window. */
  def dedupKeepBest(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    val corpus = docs.unionByName(docs.select(
      (col("doc_id") + 100000L).as("doc_id"), col("text")))
    val assigned = corpus.select(md5(col("text")).as("group_key"),
      col("doc_id"), ((col("doc_id") * 31) % 100).as("score"))
    keepBest(assigned, "group_key", "doc_id", "score")
      .select(col("group_key"), col("keep_id"),
        col("best_score").cast("long").as("best_score"), col("n_members"))
  }

  val dedupKeepBestSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents),
      |assigned AS (
      |  SELECT md5(text) AS group_key, doc_id,
      |    (doc_id * 31) % 100 AS score
      |  FROM corpus),
      |ranked AS (
      |  SELECT group_key, doc_id, score,
      |    row_number() OVER (PARTITION BY group_key
      |      ORDER BY score DESC, doc_id ASC) AS rn,
      |    count(*) OVER (PARTITION BY group_key) AS n_members
      |  FROM assigned)
      |SELECT group_key, doc_id AS keep_id, score AS best_score,
      |  CAST(n_members AS BIGINT) AS n_members
      |FROM ranked WHERE rn = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> dedupClusters _,
    "dedup_keep_best" -> dedupKeepBest _)

  val oracles: Map[String, String] = Map(
    "dedup_clusters" -> dedupClustersSql,
    "dedup_keep_best" -> dedupKeepBestSql)
}
