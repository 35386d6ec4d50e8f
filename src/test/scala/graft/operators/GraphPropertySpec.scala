package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized property pins for the graph tier (the r12 adjudication
  * discipline: laws, not examples).
  *
  *  - Connected components ≡ a single-node union-find ground truth over
  *    random graphs spanning the shapes that break naive propagation
  *    (long paths, dense blobs, isolated self-loops, duplicate and
  *    reversed edges).
  *  - Personalized PageRank with EVERY node as a seed is EXACTLY global
  *    PageRank — the restart distribution degenerates to uniform and
  *    the integer arithmetic is identical term for term, so equality is
  *    bitwise, not approximate.
  */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(v => v -> find(v)).toMap
  }

  test("CC matches single-node union-find on 12 random graphs (paths, blobs, dup/reversed edges)", graft.Slow) {
    val rnd = new Random(13)
    for (trial <- 1 to 12) {
      val shape = trial % 3
      val edges: Seq[(Long, Long)] = shape match {
        case 0 => // long path + a detached blob
          (0L until 60L).map(i => (i, i + 1)) ++
            Seq.fill(30)((100L + rnd.nextInt(10), 100L + rnd.nextInt(10)))
        case 1 => // sparse random graph with reversed duplicates
          val base = Seq.fill(80)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
          base ++ base.take(20).map(_.swap)
        case _ => // several parallel chains that must NOT merge
          (0 until 4).flatMap { c =>
            val off = c * 1000L
            (0L until 15L).map(i => (off + i, off + i + 1))
          }
      }
      val expect = unionFind(0, edges)
      val got = DedupClusters.connectedComponents(
          edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"trial $trial diverged from union-find")
    }
  }

  test("PPR with all nodes as seeds is BITWISE equal to global PageRank (10 random graphs)") {
    val rnd = new Random(31)
    for (trial <- 1 to 10) {
      val edges = Seq.fill(60)(
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter(e => e._1 != e._2)
      val df = edges.toDF("src", "dst")
      val allNodes = df.select(col("src").as("id"))
        .union(df.select(col("dst").as("id"))).distinct()
      val iters = 1 + rnd.nextInt(4)
      val pr = GraphOps.pagerank(df, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ppr = GraphOps.personalizedPagerank(df, allNodes, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pr === ppr, s"trial $trial (iters=$iters) diverged")
    }
  }

  test("PPR total mass never exceeds what the seeds inject (random graphs)") {
    val rnd = new Random(77)
    for (_ <- 1 to 5) {
      val edges = Seq.fill(50)(
        (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      val df = edges.toDF("src", "dst")
      val seeds = Seq.fill(4)(rnd.nextInt(20).toLong).distinct.toDF("id")
      val nSeeds = seeds.count()
      val total = GraphOps.personalizedPagerank(df, seeds, iters = 3)
        .agg(sum(col("rank"))).collect().head.getLong(0)
      // each iteration injects teleport at seeds and at most conserves
      // walked mass (floor-div + dangling evaporation only lose mass):
      // total <= nSeeds * (teleport + damping-decayed initial) <= nSeeds*scale
      assert(total <= nSeeds * 1000000000L,
        s"mass $total exceeds the seeds' injection bound")
    }
  }
}
