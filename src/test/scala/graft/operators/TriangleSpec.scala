package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]) = {
    val r = GraphOps.triangleCount(edges.toDF("src", "dst")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("K4 has 4 triangles; K3 has 1; a path has none") {
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    assert(census(k4) === ((4L, 6L, 12L, 4L)))
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === ((3L, 3L, 3L, 1L)))
    assert(census(Seq((1L, 2L), (2L, 3L), (3L, 4L)))._4 === 0L)
  }

  test("duplicate, reversed, and self-loop edges don't change the census") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = tri ++ Seq((2L, 1L), (3L, 2L), (1L, 1L), (1L, 2L))
    assert(census(noisy) === census(tri))
  }

  test("hub-and-spoke counts wedges but no triangles") {
    val star = (2L to 7L).map(l => (1L, l))
    val (n, e, w, t) = census(star)
    assert((n, e, t) === ((7L, 6L, 0L)))
    assert(w === 15L) // C(6,2) at the hub
  }

  test("gate runs on the co-purchase graph with a consistent census") {
    val r = GraphOps.triangleGate(spark, sf).collect().head
    val (nodes, edges, wedges, tris) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))
    assert(nodes > 0 && edges > 0)
    assert(wedges >= tris * 3) // every triangle contributes 3 wedges
  }

  test("plan: census never goes cartesian") {
    val plan = GraphOps.triangleGate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }
}
