package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SemDeDup must keep exactly the lowest-centroid-cosine member of
  * every within-cluster duplicate group: constructed vectors pin the
  * assignment tie-break, the keep-outlier rule and the earliest-dup_of
  * report; a single-node reference (same double-fold cosine as VecDot)
  * pins the whole real embeddings table under fixed centroids, any
  * layout; the quadratic-cluster probe must fail loudly.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Tables.embeddings(spark, sf)
    .filter(col("vec_id") < 300).select("vec_id", "embedding").cache()

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("constructed: keep-outlier rule, assignment tie-break, earliest dup_of") {
    val cents = Seq((0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("list_id", "centroid")
    val d = Seq(
      (1L, Array(10.0f, 0.0f)),   // cluster 0, centroid_sim = 1.0
      (2L, Array(9.9f, 0.3f)),    // cluster 0, near-parallel to 1 → dup pair
      (3L, Array(9.8f, 0.6f)),    // cluster 0, similar to both 1 and 2
      (4L, Array(0.0f, 5.0f)),    // cluster 1, alone
      (5L, Array(3.0f, 4.0f)),    // cluster 1 (dist² 18 < 20), cos to 4 = 0.8
      (6L, Array(1.0f, 1.0f))     // equidistant to both centroids → tie → 0
    ).toDF("vec_id", "embedding")
    val got = SemDedup
      .semDedupWithCentroids(d, cents, threshold = 0.95, id = "vec_id")
      .as[(Long, Int, Double, Boolean, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size === 6)
    assert(got(6L)._2 === 0, "equidistant vector must tie-break to the lower list_id")
    assert(got(4L)._4 && got(5L)._4, "cos 0.8 is below threshold — both kept")
    // cluster 0 ranks by centroid_sim asc: 3 (most off-axis), then 2,
    // then 1 — vector 3 is the kept outlier; 2 and 1 are its dups, and
    // both report the EARLIEST similar cluster-mate
    assert(got(3L)._4 === true)
    assert(got(2L) === ((2L, 0, got(2L)._3, false, Some(3L))))
    assert(got(1L) === ((1L, 0, got(1L)._3, false, Some(3L))))
    assert(got(1L)._3 > got(2L)._3 && got(2L)._3 > got(3L)._3,
      "centroid_sim must order 1 > 2 > 3")
  }

  test("matches the single-node reference on the real table (plus seeded duplicates) under fixed centroids, any layout") {
    // random synthetic embeddings are near-orthogonal — seed real
    // duplicate groups (exact copies + a perturbed near-copy) so the
    // flagging path is exercised, not just the keep-everything path
    val seededDf = vecs.unionByName(
      vecs.filter(col("vec_id") < 6)
        .select((col("vec_id") + 900000L).as("vec_id"), col("embedding")))
      .unionByName(vecs.filter(col("vec_id") === 7)
        .select(lit(900100L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x))
            .as("embedding")))
      .cache()
    val rows = seededDf.as[(Long, Array[Float])].collect().sortBy(_._1)
    // fixed, arbitrary centroids: every 40th vector — deterministic,
    // no training in the loop
    val cents = rows.filter(_._1 % 40 == 0).take(8)
      .zipWithIndex.map { case ((_, e), i) => (i, e) }
    val centsDf = cents.toSeq.toDF("list_id", "centroid")
    val threshold = 0.9

    // reference: assign (argmax 2e·c − |c|², tie lower list), rank by
    // (centroid cos asc, id), flag vs any earlier, earliest dup_of
    val assigned = rows.map { case (id, e) =>
      val best = cents.map { case (li, c) =>
        (li, 2.0 * dot(e, c) - dot(c, c)) }
        .reduceLeft((x, y) => if (y._2 > x._2) y else x) // first max wins ties
      (id, e, best._1, cos(e, cents(best._1)._2))
    }
    val expect = assigned.groupBy(_._3).toSeq.flatMap { case (_, members) =>
      val ordered = members.sortBy(m => (m._4, m._1)).toSeq
      ordered.zipWithIndex.map { case ((id, e, cl, cs), i) =>
        val first = ordered.take(i).find(p => cos(e, p._2) >= threshold)
        id -> ((cl, cs, first.isEmpty, first.map(_._1)))
      }
    }.toMap

    def run(d: org.apache.spark.sql.DataFrame) = SemDedup
      .semDedupWithCentroids(d, centsDf, threshold, id = "vec_id")
      .as[(Long, Int, Double, Boolean, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val got = run(seededDf)
    assert(got.keySet === expect.keySet)
    expect.foreach { case (id, e) =>
      assert(got(id)._1 === e._1, s"cluster of $id")
      assert(math.abs(got(id)._2 - e._2) < 1e-12, s"centroid_sim of $id")
      assert((got(id)._3, got(id)._4) === ((e._3, e._4)), s"verdict of $id")
    }
    assert(expect.values.count(!_._3) > 0,
      "threshold 0.9 must flag something on this table or the test is vacuous")
    assert(run(seededDf.repartition(7)) === got, "layout invariance")
  }

  test("trained path: exact copies always land in one cluster and all but one are pruned") {
    val copies = vecs.filter(col("vec_id") < 5)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    val seeded = vecs.unionByName(copies)
    val got = SemDedup.semDedup(seeded, threshold = 0.999, nlist = 8,
        id = "vec_id")
      .as[(Long, Int, Double, Boolean, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size.toLong === seeded.count())
    (0L until 5L).foreach { i =>
      val (orig, copy) = (got(i), got(i + 900000L))
      assert(orig._2 === copy._2, s"identical vectors $i split across clusters")
      assert(!(orig._4 && copy._4), s"identical pair $i both kept")
      assert(orig._4 || copy._4 ||
        (orig._5.isDefined && copy._5.isDefined),
        s"pair $i: if both flagged, both must name an earlier dup")
    }
  }

  test("a persisted IVF index's coarse quantizer drives semantic dedup without retraining") {
    val path = java.nio.file.Files.createTempDirectory("graft-semivf").toString
    val seeded = vecs.unionByName(vecs.filter(col("vec_id") < 4)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding")))
    IvfIndex.build(seeded, "vec_id", path, nlist = 8, m = 4, ksub = 16)
    val idx = IvfIndex.load(spark, path)
    val got = SemDedup.semDedupWithCentroids(seeded, idx.coarseCentroids,
        threshold = 0.999, id = "vec_id")
      .as[(Long, Int, Double, Boolean, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size.toLong === seeded.count())
    (0L until 4L).foreach { i =>
      assert(got(i)._2 === got(i + 900000L)._2,
        s"identical vectors $i split across index lists")
      assert(!(got(i)._4 && got(i + 900000L)._4),
        s"identical pair $i both kept")
    }
  }

  test("guards fail loudly; no stage is single-partition") {
    val cents = Seq((0, Array(1.0f, 0.0f))).toDF("list_id", "centroid")
    val many = (1L to 50L).map(i => (i, Array(1.0f, i / 1000.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SemDedup.semDedupWithCentroids(many, cents, 0.95, id = "vec_id",
        maxClusterSize = 10L).collect()
    }
    assert(e.getMessage.contains("raise nlist"))
    intercept[IllegalArgumentException] {
      SemDedup.semDedupWithCentroids(many, cents, 1.5, id = "vec_id")
    }
    val p = SemDedup
      .semDedupWithCentroids(vecs, Seq((0, Array.fill(8)(0.1f)), (1, Array.fill(8)(-0.1f)))
        .toDF("list_id", "centroid"), 0.95, id = "vec_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"), p)
  }
}
