package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int) =
    GraphOps.pagerank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node cycle is the exact fixed point") {
    // A↔B, outdeg 1 each: r = 0.15e9 + floor(0.85 * 1e9) = 1e9 forever
    val got = ranks(Seq((1L, 2L), (2L, 1L)), iters = 3)
    assert(got === Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("chain with a sink matches hand-folded integer arithmetic") {
    // A -> B, B dangling
    val i1 = ranks(Seq((1L, 2L)), 1)
    assert(i1(1L) === 150000000L)
    assert(i1(2L) === 150000000L + 850000000L)
    val i2 = ranks(Seq((1L, 2L)), 2)
    assert(i2(1L) === 150000000L)
    assert(i2(2L) === 150000000L + (150000000L * 85) / 100)
  }

  test("hub of a star out-ranks the leaves; duplicate edges collapse") {
    val leaves = (2L to 6L)
    val edges = leaves.flatMap(l => Seq((1L, l), (l, 1L), (l, 1L)))
    val got = ranks(edges, 3)
    leaves.foreach(l => assert(got(1L) > got(l)))
    // duplicate (l,1) edges must not double a leaf's contribution:
    // with outdeg(leaf)=1 the hub gets 5 whole shares
    val gotNoDup = ranks(leaves.flatMap(l => Seq((1L, l), (l, 1L))), 3)
    assert(got === gotNoDup)
  }

  test("dangling mass evaporates: total rank is monotonically non-increasing") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)) // 4 is a sink
    val totals = (1 to 3).map(i => ranks(edges, i).values.sum)
    assert(totals === totals.sorted.reverse)
    assert(totals.last < totals.head)
  }

  test("degrees counts both directions with zero-fill") {
    val got = GraphOps.degrees(Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(1L -> ((2L, 0L)), 2L -> ((1L, 1L)), 3L -> ((0L, 2L))))
  }

  test("iteration bounds refuse loudly") {
    intercept[IllegalArgumentException] {
      GraphOps.pagerank(Seq((1L, 2L)).toDF("s", "d"), iters = 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pagerank(Seq((1L, 2L)).toDF("s", "d"), dampingPct = 100)
    }
  }

  test("khopDistances: min distance wins, frontier stops at k, seeds at 0") {
    // 1 -> 2 -> 3 -> 4 and a shortcut 1 -> 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("id")
    val got = GraphOps.khopDistances(edges, seeds, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    val one = GraphOps.khopDistances(edges, seeds, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("khopDistances: empty frontier terminates early; disconnected stays out") {
    val edges = Seq((1L, 2L), (8L, 9L)).toDF("s", "d")
    val got = GraphOps.khopDistances(edges, Seq(1L).toDF("id"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L))
  }

  test("gate runs on the trade graph; suppliers and customers both present") {
    val got = GraphOps.pagerankGate(spark, sf)
    assert(got.filter(col("id") >= 1000000L).count() > 0)
    assert(got.filter(col("id") < 1000000L).count() > 0)
    assert(got.filter(col("rank") < 150000000L).count() === 0)
  }

  test("plan: iterations are keyed joins off checkpointed frames, no cartesian") {
    val plan = GraphOps.pagerankGate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("personalized pagerank: hand-folded chain, restart mass only at seeds") {
    // 1 -> 2 -> 3, seed {1}. teleport = 150e6, scale = 1e9.
    // i1: r1 = 150e6; r2 = floor(1e9*85/100) = 850e6; r3 = 0
    // i2: r1 = 150e6; r2 = floor(150e6*85/100) = 127.5e6;
    //     r3 = floor(850e6*85/100) = 722.5e6
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val i1 = GraphOps.personalizedPagerank(edges, seeds, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(i1 === Map(1L -> 150000000L, 2L -> 850000000L, 3L -> 0L))
    val i2 = GraphOps.personalizedPagerank(edges, seeds, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(i2 === Map(1L -> 150000000L, 2L -> 127500000L, 3L -> 722500000L))
  }

  test("ppr nonzero support after k iterations equals the <=k-hop out-neighborhood") {
    // path 1..6, seed 1: after 3 iters only nodes within 3 hops hold mass
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = GraphOps.personalizedPagerank(edges, seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(got(_) > 0L))
    assert((5L to 6L).forall(got(_) === 0L))
  }

  test("ppr: a seed absent from the edge set still holds its teleport mass") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(99L).toDF("id")
    val got = GraphOps.personalizedPagerank(edges, seeds, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(99L) === 150000000L)
    assert(got(1L) === 0L && got(2L) === 0L)
  }

  test("ppr gate: seeds outrank everything; non-reachable nodes hold zero") {
    val got = GraphOps.pprGate(spark, sf).cache()
    assert(got.count() > 0)
    // some mass flowed beyond the seeds, and zero-rank nodes exist
    assert(got.filter(col("rank") > 0 && col("id") < 1000000L).count() > 0)
    got.unpersist()
  }

  test("weighted pagerank: mass splits by weight, hand-folded") {
    // 1 ->(3) 2, 1 ->(1) 3: outw=4, teleport 150e6, t = 850e6
    // i1: r2 = 150e6 + (850e6*3) div 4 = 150e6 + 637.5e6
    //     r3 = 150e6 + (850e6*1) div 4 = 150e6 + 212.5e6
    val got = GraphOps.pagerankWeighted(
        Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 150000000L,
      2L -> 787500000L, 3L -> 362500000L))
  }

  test("weighted pagerank with uniform weights is BITWISE the unweighted rank") {
    // floor-div composition: ((pr*d) div 100 * 1) div outw == (pr*d) div (100*outw)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val edges = Seq.fill(40)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
        .filter(e => e._1 != e._2).distinct
      val un = GraphOps.pagerank(edges.toDF("src", "dst"), iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val wt = GraphOps.pagerankWeighted(
          edges.map(e => (e._1, e._2, 1L)).toDF("src", "dst", "w"), iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(un === wt)
    }
  }

  test("weighted pagerank merges parallel edges additively and refuses w <= 0") {
    val merged = GraphOps.pagerankWeighted(
        Seq((1L, 2L, 2L), (1L, 2L, 1L), (1L, 3L, 1L)).toDF("src", "dst", "w"),
        iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = GraphOps.pagerankWeighted(
        Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === direct)
    val e = intercept[Exception] {
      GraphOps.pagerankWeighted(
        Seq((1L, 2L, 0L)).toDF("src", "dst", "w"), iters = 1).collect()
    }
    assert(e.getMessage.contains("non-positive weight"))
    // a NULL weight must refuse identically, not silently drop the edge
    // (when(w <= 0) alone evaluates NULL on nulls and falls through)
    val en = intercept[Exception] {
      GraphOps.pagerankWeighted(
        Seq((1L, 2L, Some(3L)), (1L, 3L, Option.empty[Long]))
          .toDF("src", "dst", "w"), iters = 1).collect()
    }
    assert(en.getMessage.contains("weight"))
  }

  test("weighted gate: heavier trade relationships outrank (sanity on real data)") {
    val got = GraphOps.pagerankWeightedGate(spark, sf)
    assert(got.count() > 0)
    assert(got.filter(col("rank") < 150000000L).count() === 0)
  }

  test("Anchor.Reliable pagerank and khop are bit-identical to Anchor.Local") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_pr").toString
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (9L, 3L))
      .toDF("src", "dst")
    val prLocal = GraphOps.pagerank(edges, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prRel = GraphOps.pagerank(edges, iters = 4,
        anchor = Anchor.Reliable(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prLocal === prRel)
    val seeds = Seq(1L).toDF("id")
    val khLocal = GraphOps.khopDistances(edges, seeds, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val khRel = GraphOps.khopDistances(edges, seeds, k = 3,
        anchor = Anchor.Reliable(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(khLocal === khRel)
    // reliable mode really wrote iteration state to the directory
    assert(new java.io.File(dir).listFiles.nonEmpty)
  }

  test("Anchor.Reliable checkpoint-dir reuse compares fully-qualified URIs") {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_uri").toString
    val df = Seq((1L, 2L)).toDF("src", "dst")
    Anchor.Reliable(dir)(df).count()
    val set1 = sc.getCheckpointDir.get
    // Spark stores the FULLY-QUALIFIED d/<uuid> path; same dir spelled
    // WITH its scheme must be recognized as already-ours (no re-set,
    // the per-context uuid subdirectory is reused)
    Anchor.Reliable(s"file:$dir")(df).count()
    assert(sc.getCheckpointDir.get === set1,
      "scheme-qualified spelling of the same dir was treated as foreign")
    // a DIFFERENT directory must re-point the context, never be
    // mistaken for ours on a path-prefix or same-path-other-fs match
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ckpt_uri2").toString
    Anchor.Reliable(dir2)(df).count()
    val set2 = sc.getCheckpointDir.get
    assert(set2 !== set1)
    assert(new org.apache.hadoop.fs.Path(set2).getParent.toUri.getPath
      === new org.apache.hadoop.fs.Path(dir2).toUri.getPath)
  }
}
