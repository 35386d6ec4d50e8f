package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupClustersSpec extends SparkSpec {
  test("connected components: chain, clique, and disjoint pairs") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), clique 10-11-12, pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("a", "b")
    val cc = DedupClusters.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L).forall(cc(_) == 20L))
    assert(cc.size == 9)
  }

  test("CC converges on a path graph far deeper than any fixed label-propagation cap") {
    import spark.implicits._
    // diameter 400: plain min-label propagation (the pre-r13 form)
    // needs 400 rounds and would have exited its cap with silently
    // WRONG labels; pointer doubling is O(log d) — well inside the
    // default maxIter — and must label the whole path with its minimum
    val edges = (0L until 400L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = DedupClusters.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 401)
    assert(cc.values.forall(_ == 0L), "path must collapse to component 0")
  }

  test("CC refuses loudly at the iteration cap instead of emitting wrong labels") {
    import spark.implicits._
    val edges = (0L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      DedupClusters.connectedComponents(edges, "a", "b", maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("CC handles self-loops, reversed duplicates, and empty input") {
    import spark.implicits._
    val edges = Seq((5L, 5L), (1L, 2L), (2L, 1L)).toDF("a", "b")
    val cc = DedupClusters.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
    val none = DedupClusters.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(none.isEmpty)
  }

  test("Anchor.Reliable yields bit-identical components to Anchor.Local") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_cc").toString
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 9L), (9L, 4L), (100L, 3L))
      .toDF("a", "b")
    val local = DedupClusters.connectedComponents(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliable = DedupClusters.connectedComponents(edges, "a", "b",
      anchor = Anchor.Reliable(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local === reliable)
    // the reliable mode really did write checkpoint state to the dir
    assert(new java.io.File(dir).listFiles != null &&
      new java.io.File(dir).listFiles.nonEmpty)
  }

  test("dedup clusters: every near-dup pair lands in one cluster") {
    val clusters = DedupClusters.dedupClusters(spark, sf).cache()
    assert(clusters.count() === Tables.documents(spark, sf).count())
    // both endpoints of every near-dup pair share a cluster id
    val pairs = Dedup.dedupNgramJaccard(spark, sf).select("id_a", "id_b")
    val broken = pairs
      .join(clusters.select(col("doc_id").as("id_a"), col("cluster_id").as("ca")), Seq("id_a"))
      .join(clusters.select(col("doc_id").as("id_b"), col("cluster_id").as("cb")), Seq("id_b"))
      .filter(col("ca") =!= col("cb")).count()
    assert(broken === 0)
    // representatives: exactly one doc per cluster keeps cluster_id == doc_id
    val reps = clusters.filter(col("cluster_id") === col("doc_id")).count()
    assert(reps === clusters.select("cluster_id").distinct().count())
  }

  test("keepBest: argmax score per group, ties to min id, null scores " +
    "lose, all-null group falls back to min id") {
    import spark.implicits._
    val assigned = Seq(
      ("g1", 1L, Some(5.0)), ("g1", 2L, Some(9.0)), ("g1", 3L, None),
      ("g2", 10L, Some(7.0)), ("g2", 11L, Some(7.0)),
      ("g3", 20L, None), ("g3", 21L, None))
      .toDF("group_key", "doc_id", "score")
    val out = DedupClusters.keepBest(assigned, "group_key", "doc_id", "score")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getAs[java.lang.Double]("best_score")),
          r.getLong(3)))).toMap
    assert(out("g1") == ((2L, Some(9.0), 3L)))  // argmax beats null + lower
    assert(out("g2") == ((10L, Some(7.0), 2L))) // tie -> min id
    assert(out("g3") == ((20L, None, 2L)))      // all-null -> min id
  }
}
