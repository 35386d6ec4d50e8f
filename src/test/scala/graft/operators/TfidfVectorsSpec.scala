package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TfidfVectorsSpec extends SparkSpec {

  private val fixture = Seq(
    (1L, "cat sat mat"),
    (2L, "cat sat mat"),            // exact copy of 1 — identical vector
    (3L, "cat sat hat"),            // one word changed — high cosine to 1
    (4L, "spark shuffle partition broadcast"), // disjoint topic
    (5L, ""))                       // empty — the zero vector

  private def fixtureDf = {
    import spark.implicits._
    fixture.toDF("doc_id", "text")
  }

  private def vecs(dim: Int = 64): Map[Long, Array[Float]] =
    TfidfVectors.vectorize(fixtureDf, dim = dim).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cos(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y }.sum

  test("matches a scalar re-derivation through the same bucket map") {
    import spark.implicits._
    val dim = 64
    // term → bucket from the engine's own hash (the contract is the
    // WEIGHTING arithmetic; the hash is pinned elsewhere as xxhash64)
    val terms = fixture.flatMap(_._2.split(" ")).filter(_.nonEmpty).distinct
    val bucketOf = terms.toDF("term")
      .select(col("term"), pmod(xxhash64(col("term")), lit(dim.toLong))
        .cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val n = fixture.size.toDouble
    // per-doc reference: tf per bucket, df per bucket over ALL docs,
    // idf = ln((1+N)/(1+df)) + 1, L2 normalize
    val docBuckets = fixture.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq.map(bucketOf)
        .groupBy(identity).map { case (b, xs) => b -> xs.size.toDouble } }.toMap
    val df = docBuckets.values.flatMap(_.keys).groupBy(identity)
      .map { case (b, xs) => b -> xs.size.toDouble }
    val got = vecs(dim)
    for ((id, _) <- fixture) {
      val w = (0 until dim).map { b =>
        docBuckets(id).get(b) match {
          case Some(tf) => tf * (math.log((1 + n) / (1 + df(b))) + 1)
          case None => 0.0
        }
      }
      val norm = math.sqrt(w.map(x => x * x).sum)
      val want = if (norm == 0) w.map(_ => 0f)
                 else w.map(x => (x / norm).toFloat)
      assert(got(id).length === dim)
      got(id).zip(want).zipWithIndex.foreach { case ((a, e), i) =>
        assert(math.abs(a - e) < 1e-6f, s"doc $id dim $i: $a vs $e") }
    }
  }

  test("unit norm for non-empty docs, zero vector for empty, copies identical") {
    val v = vecs()
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val n = math.sqrt(v(id).map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, s"doc $id norm $n")
    }
    assert(v(5L).forall(_ == 0f))
    assert(v(1L).toSeq === v(2L).toSeq)
  }

  test("cosine tracks lexical overlap: near-copy high, disjoint-topic zero-ish") {
    val v = vecs()
    val near = cos(v(1L), v(3L))
    val far = cos(v(1L), v(4L))
    // idf DOWN-weights the shared common terms relative to the two
    // differing rare ones — by design (that is what makes the changed
    // word count); ~0.58 here, still far above the disjoint pair
    assert(near > 0.5, s"near-copy cosine $near")
    // disjoint vocabularies overlap only through hash collisions
    assert(far < 0.3, s"disjoint cosine $far")
    assert(near > far)
  }

  test("rejects non-power-of-two or oversized dim") {
    intercept[IllegalArgumentException](
      TfidfVectors.vectorize(fixtureDf, dim = 100))
    intercept[IllegalArgumentException](
      TfidfVectors.vectorize(fixtureDf, dim = 8192))
  }

  test("semDedupText drops the exact copy, keeps the distinct topic") {
    import spark.implicits._
    // enough rows for the k-means trainer: the fixture plus unique filler
    val filler = (100L until 140L)
      .map(i => (i, s"filler$i unique$i content$i")).toSeq
    val docs = (fixture.filter(_._1 != 5L) ++ filler).toDF("doc_id", "text")
    val kept = TfidfVectors.semDedupText(docs, threshold = 0.95, nlist = 4)
      .where(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    // 1 and 2 are identical vectors: exactly one of them survives
    assert(kept.intersect(Set(1L, 2L)).size === 1,
      s"expected one of the twins, got ${kept.intersect(Set(1L, 2L))}")
    // the disjoint-topic doc always survives
    assert(kept.contains(4L))
    // every filler doc is unique — all survive
    assert(filler.map(_._1).toSet.subsetOf(kept))
  }

  test("real corpus: vectors land unit-length and cluster-assignable") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(200)
    val v = TfidfVectors.vectorize(docs)
    val norms = v.select(
      sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("n"))
      .collect().map(_.getDouble(0))
    assert(norms.length === 200)
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5 || n == 0.0))
  }
}
