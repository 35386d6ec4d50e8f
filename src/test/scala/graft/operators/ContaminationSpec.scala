package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic contamination must flag exactly the corpus documents a
  * brute-force cosine sweep against the benchmark flags: the LSH
  * candidates can only MISS (never invent) pairs, and the auto sizing
  * GUARANTEES per-pair miss ≤ maxMiss (1e-6) at the threshold — far
  * lower for the spec's seeded cos ≥ 0.99 pairs — the same
  * probabilistic-but-pinned footing as the recall specs. (The n-gram
  * path E10 is oracle-gated; this file covers the embedding path.)
  */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Tables.embeddings(spark, sf)
    .filter(col("vec_id") < 300).select("vec_id", "embedding").cache()

  private def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def cos(a: Seq[Float], b: Seq[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("matches the brute-force cosine sweep on the real table with a seeded benchmark") {
    // benchmark: exact copies of five corpus vectors, one perturbed
    // near-copy, and two corpus vectors verbatim under their own role —
    // every above-threshold pair sits at cos ≥ 0.99, where the
    // auto-sized (4-plane, 14-table) sketch misses with prob ≈ 1e-11
    val bench = corpus.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100L).as("bench_id"), col("embedding"))
      .unionByName(corpus.filter(col("vec_id") === 7)
        .select(lit(200L).as("bench_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + lit(0.0005f)).otherwise(x))
            .as("embedding")))
      .unionByName(corpus.filter(col("vec_id").isin(250L, 251L))
        .select(col("vec_id").as("bench_id"), col("embedding")))
      .cache()
    val dims = corpus.head().getSeq[Float](1).length
    val threshold = 0.95

    val cv = corpus.as[(Long, Seq[Float])].collect()
    val bv = bench.as[(Long, Seq[Float])].collect()
    val expect = cv.flatMap { case (id, e) =>
      val hits = bv.map { case (bid, be) => (bid, cos(e, be)) }
        .filter(_._2 >= threshold)
      if (hits.isEmpty) None
      else {
        val worst = hits.maxBy(h => (h._2, h._1))
        Some(id -> ((hits.length.toLong, worst._1, worst._2)))
      }
    }.toMap
    assert(expect.size >= 8, "seeding must contaminate at least 8 docs")

    val got = Contamination.embedContamination(corpus, bench, threshold,
        dims, idCol = "vec_id")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (id, (n, wid, wcos)) =>
      assert(got(id)._1 === n, s"hit count of $id")
      assert(got(id)._2 === wid, s"worst bench of $id")
      assert(math.abs(got(id)._3 - wcos) < 1e-12, s"worst cos of $id")
    }
    intercept[IllegalArgumentException] {
      Contamination.embedContamination(corpus, bench, 1.5, dims,
        idCol = "vec_id")
    }
    // explicit sizings agree with the auto path: the exact-cosine
    // verify makes the output a pure function of the input whenever
    // recall holds, so the old fixed 24×4 sketch and an explicit
    // planes-only call must flag the identical set
    val fixed = Contamination.embedContamination(corpus, bench, threshold,
        dims, idCol = "vec_id", tables = 24, planesPerTable = 4)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(fixed === got)
    val auto = Contamination.embedContamination(corpus, bench, threshold,
        dims, idCol = "vec_id", planesPerTable = 4)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(auto === got)
  }

  test("recall arithmetic: planeAgreement, requiredTables, joint auto sizing") {
    // Charikar: p = 1 − θ/π; the three closed-form anchors
    assert(math.abs(Contamination.planeAgreement(1.0) - 1.0) < 1e-12)
    assert(math.abs(Contamination.planeAgreement(0.0) - 0.5) < 1e-12)
    assert(math.abs(Contamination.planeAgreement(0.5) - 2.0 / 3.0) < 1e-12)
    // more planes at a fixed threshold must be bought back in tables
    val t8 = Contamination.requiredTables(0.8, 8)
    val t15 = Contamination.requiredTables(0.8, 15)
    assert(t8 < t15, s"tables must grow with planes ($t8 vs $t15)")
    // the ADVICE scenario: 15 planes at threshold 0.8 needs hundreds of
    // tables for 1e-6 miss — the regime the old fixed 24 silently lost
    assert(t15 > 200, s"15 planes at 0.8 needs >200 tables, got $t15")
    // exact-threshold 1.0 collides always: one table suffices
    assert(Contamination.requiredTables(1.0, 20) === 1)
    // joint sizing shrinks planes to fit the budget (1M corpus wants 15
    // planes for occupancy; recall at 0.8 forces them down to 7)
    val (p, t) = Contamination.autoSketchSize(1000000L, 0.8, 1e-6, 64)
    assert(p === 7 && t <= 64, s"got ($p, $t)")
    assert(Contamination.requiredTables(0.8, p) === t)
    // infeasible at the 4-plane floor fails loudly, not silently
    intercept[IllegalArgumentException] {
      Contamination.autoSketchSize(1000000L, 0.2, 1e-6, 64)
    }
    intercept[IllegalArgumentException] { // explicit planes, auto tables
      Contamination.embedContamination(corpus, corpus.limit(1)
          .select(col("vec_id").as("bench_id"), col("embedding")),
        0.5, 16, idCol = "vec_id", planesPerTable = 20)
    }
  }

  test("defaultPlanesPerTable tracks corpus size: floor 4, ~32 per bucket, ceiling 20") {
    assert(Contamination.defaultPlanesPerTable(1L) === 4)
    assert(Contamination.defaultPlanesPerTable(512L) === 4)
    assert(Contamination.defaultPlanesPerTable(100000L) === 12)
    assert(Contamination.defaultPlanesPerTable(100000000L) === 20)
    assert(Contamination.defaultPlanesPerTable(Long.MaxValue / 4) === 20)
    val sizes = Seq(100L, 10000L, 1000000L, 100000000L)
      .map(Contamination.defaultPlanesPerTable)
    assert(sizes === sizes.sorted, "monotone in corpus size")
  }
}
