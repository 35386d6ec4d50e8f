package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ClusterOpsSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal unit centroids — assignment is unambiguous
  private def axes = Seq(
    (0, Array(1f, 0f)), (1, Array(0f, 1f))).toDF("list_id", "centroid")

  test("assignCentroids: nearest centroid, cosine, and the lower-list tie") {
    val vecs = Seq(
      (1L, Array(0.9f, 0.1f)),  // → cluster 0
      (2L, Array(0.1f, 0.9f)),  // → cluster 1
      (3L, Array(0.5f, 0.5f)))  // equidistant → tie to lower list_id 0
      .toDF("id", "embedding")
    val out = ClusterOps.assignCentroids(vecs, axes)
      .orderBy("id").collect()
    assert(out.map(_.getInt(2)).toSeq === Seq(0, 1, 0))
    // centroid_sim is the plain cosine to the chosen centroid
    val sim1 = out(0).getDouble(3)
    val expect = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
    assert(math.abs(sim1 - expect) < 1e-6)
  }

  test("assignCentroids guards: empty and duplicate centroid frames") {
    val vecs = Seq((1L, Array(1f, 0f))).toDF("id", "embedding")
    val empty = Seq.empty[(Int, Array[Float])].toDF("list_id", "centroid")
    assertThrows[IllegalArgumentException] {
      ClusterOps.assignCentroids(vecs, empty)
    }
    val dup = Seq((0, Array(1f, 0f)), (0, Array(0f, 1f)))
      .toDF("list_id", "centroid")
    assertThrows[IllegalArgumentException] {
      ClusterOps.assignCentroids(vecs, dup)
    }
  }

  test("prototypePrune: floor cut, desc order, lower-id-drops-first ties") {
    // cluster 0: sims 9, 8, 8, 1 → dropFrac 0.5 drops floor(2) rows:
    // rank1 = sim 9 (id 4), rank2 = the sim-8 TIE broken to id 1
    val rows = Seq(
      (1L, 0, 8.0), (2L, 0, 8.0), (3L, 0, 1.0), (4L, 0, 9.0),
      (5L, 1, 5.0)) // singleton cluster: floor(0.5*1)=0 → kept
      .toDF("id", "cluster_id", "centroid_sim")
    val out = ClusterOps.prototypePrune(rows, dropFrac = 0.5)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> true,
      4L -> false, 5L -> true))
    // dropFrac 0 keeps everything
    val all = ClusterOps.prototypePrune(rows, dropFrac = 0.0)
      .filter(col("keep")).count()
    assert(all === 5)
    assertThrows[IllegalArgumentException] {
      ClusterOps.prototypePrune(rows, dropFrac = 1.0)
    }
  }

  test("prototypePrune: null sim fails closed and never eats the drop quota") {
    // 2 scored + 1 null, dropFrac 0.5 → floor(0.5*2)=1 scored row
    // dropped (the higher sim), the null row keep=false regardless
    val rows = Seq(
      (1L, 0, Some(7.0)), (2L, 0, Some(3.0)), (3L, 0, None))
      .toDF("id", "cluster_id", "centroid_sim")
    val out = ClusterOps.prototypePrune(rows, dropFrac = 0.5)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("balancedSample: quota, small clusters, determinism, seed sensitivity") {
    val rows = (1L to 20L).map(i => (i, (i % 2).toInt)).toDF("id", "cluster_id")
    val out = ClusterOps.balancedSample(rows, perCluster = 3)
    val kept = out.filter(col("keep")).groupBy("cluster_id").count()
      .as[(Int, Long)].collect().toMap
    assert(kept === Map(0 -> 3L, 1 -> 3L))
    // deterministic: a second run selects the same ids
    val ids1 = out.filter(col("keep")).select("id").as[Long].collect().toSet
    val ids2 = ClusterOps.balancedSample(rows, perCluster = 3)
      .filter(col("keep")).select("id").as[Long].collect().toSet
    assert(ids1 === ids2)
    // a cluster smaller than the quota keeps all members
    val small = Seq((1L, 0), (2L, 0)).toDF("id", "cluster_id")
    assert(ClusterOps.balancedSample(small, perCluster = 5)
      .filter(col("keep")).count() === 2)
    // the draw is keyed on (id, seed): another seed reselects
    val ids3 = ClusterOps.balancedSample(rows, perCluster = 3, seed = 7L)
      .filter(col("keep")).select("id").as[Long].collect().toSet
    assert(ids1 !== ids3) // 20-choose-3 twice colliding ≈ never for md5
    assertThrows[IllegalArgumentException] {
      ClusterOps.balancedSample(rows, perCluster = 0)
    }
  }

  test("balancedSample: a row's key is growth-stable across corpus extension") {
    // the selection in cluster 0 is a pure function of the member set:
    // adding rows to cluster 1 cannot touch cluster 0's draw
    val base = (1L to 10L).map(i => (i, 0)).toDF("id", "cluster_id")
    val extended = base.unionAll(
      (100L to 120L).map(i => (i, 1)).toDF("id", "cluster_id"))
    val k1 = ClusterOps.balancedSample(base, 4)
      .filter(col("keep")).select("id").as[Long].collect().toSet
    val k2 = ClusterOps.balancedSample(extended, 4)
      .filter(col("keep") && col("cluster_id") === 0)
      .select("id").as[Long].collect().toSet
    assert(k1 === k2)
  }

  test("d4Select: dedup-then-prune composition, fail-closed at dedup") {
    // cluster 0, four members ordered by centroid_sim asc = d, c, b, a:
    //   d (sim .30) — the outlier, kept by dedup
    //   c (sim .80) — near-DUPLICATE of d (cos ≈ 1) → keep_dedup=false
    //   b (sim .95), a (sim .99) — distinct directions, survive dedup
    // survivors (d, b, a): dropFrac .34 → floor(1) drops the MOST
    // prototypical survivor (a); c must come back keep_proto=false
    // (fail closed — it never reached pruning), not null
    def unit(x: Double, y: Double, z: Double): Array[Float] = {
      val n = math.sqrt(x * x + y * y + z * z)
      Array((x / n).toFloat, (y / n).toFloat, (z / n).toFloat)
    }
    val c0 = unit(1, 0, 0)
    val vecs = Seq(
      (1L, unit(1, 0.05, 0)),      // a: sim≈.999
      (2L, unit(1, 0.3, 0)),       // b: sim≈.96
      (3L, unit(0.3, 1, 0.95)),    // c: low sim, duplicate of d
      (4L, unit(0.3, 1, 0.951)))   // d: lowest sim (slightly farther)
      .toDF("id", "embedding")
    val cents = Seq((0, c0)).toDF("list_id", "centroid")
    val assigned = ClusterOps.assignCentroids(vecs, cents)
    val out = ClusterOps.d4Select(assigned, threshold = 0.99,
        dropFrac = 0.34)
      .select("id", "keep_dedup", "keep_proto", "keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // the dedup pair: whichever of 3/4 has LOWER centroid_sim is kept
    val simOf = assigned.select("id", "centroid_sim")
      .as[(Long, Double)].collect().toMap
    val (keptDup, dropDup) =
      if (simOf(3L) < simOf(4L)) (3L, 4L) else (4L, 3L)
    assert(out(dropDup) === ((false, false, false))) // fail-closed proto
    assert(out(keptDup)._1 && out(keptDup)._2 && out(keptDup)._3)
    assert(out(2L) === ((true, true, true)))  // b survives both
    assert(out(1L) === ((true, false, false))) // a: pruned prototype
  }

  test("real-corpus composition: assign real embeddings, d4Select bounds") {
    val vecs = Tables.embeddings(spark, sf).select(
      col("vec_id").as("id"), col("embedding"))
    val cents = IvfSearch.train(vecs, nlist = 8)
    val assigned = ClusterOps.assignCentroids(vecs, cents)
    val n = vecs.count()
    assert(assigned.count() === n) // every row assigned, none dropped
    val out = ClusterOps.d4Select(assigned, threshold = 0.95,
      dropFrac = 0.2)
    assert(out.count() === n)
    val nDedup = out.filter(col("keep_dedup")).count()
    val nKeep = out.filter(col("keep")).count()
    assert(nKeep <= nDedup && nDedup <= n)
    // the pruning quota really fires: kept < dedup survivors whenever
    // some cluster has ≥ 5 survivors (floor(0.2·5) ≥ 1)
    val biggest = out.filter(col("keep_dedup"))
      .groupBy("cluster_id").count().agg(max("count")).head().getLong(0)
    if (biggest >= 5) assert(nKeep < nDedup)
  }

  test("plan shape: cluster-partitioned windows, no global exchange") {
    val rows = (1L to 100L).map(i => (i, (i % 5).toInt, i.toDouble))
      .toDF("id", "cluster_id", "centroid_sim")
    val p1 = ClusterOps.prototypePrune(rows, 0.2)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange SinglePartition"), p1)
    val p2 = ClusterOps.balancedSample(rows, 5)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange SinglePartition"), p2)
  }
}
