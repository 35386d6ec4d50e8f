package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("exact groups, near-dup chains and uniques collapse to the right clusters") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda" // 1 word off
    val far = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, base),  // cluster 1: exact copies of base ...
      (2L, base),
      (3L, near),  // ... plus a near-dup chained to it
      (4L, near),  // exact copy of the near-dup
      (5L, far),   // separate cluster with one exact copy
      (6L, far),
      (7L, "totally unrelated words without any overlap whatsoever here now")
    ).toDF("doc_id", "text")

    val out = DedupPipeline.dedup(docs, threshold = 0.5).cache()
    // every row labeled, none dropped
    assert(out.count() === 7)
    val byDoc = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // docs 1-4 merge (exact 1=2, 3=4; near 1~3) into cluster 1
    (1L to 4L).foreach(i => assert(byDoc(i)._1 === 1L, s"doc $i: ${byDoc(i)}"))
    // 5,6 exact-merge into cluster 5; 7 is its own cluster
    assert(byDoc(5L)._1 === 5L && byDoc(6L)._1 === 5L)
    assert(byDoc(7L)._1 === 7L)
    // exactly one keeper per cluster, and it is the min id
    assert(out.filter(col("keep")).select("doc_id").as[Long].collect().toSet
      === Set(1L, 5L, 7L))
    val keepers = out.groupBy("cluster_id").agg(
      sum(when(col("keep"), 1).otherwise(0)).as("n"))
    assert(keepers.filter(col("n") =!= 1).count() === 0)
  }

  test("pipeline agrees with running near-dup over the full corpus", graft.Slow) {
    // the exact-first optimization must not change the final clusters
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val viaPipeline = DedupPipeline.dedup(docs, threshold = 0.5, maxDf = 1000)
      .select("doc_id", "cluster_id")
    // reference: clusters from ALL-docs pairs (oracle-grade composition:
    // exact pairs = same md5; near pairs = verified jaccard on all docs)
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
    val nearPairs = NgramDedup.scalablePairs(sh, "doc_id", 0.5, maxDf = 1000)
    val hashed = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val exactPairs = hashed.join(
        hashed.select(col("doc_id").as("id_b"), col("h")), Seq("h"))
      .filter(col("doc_id") < col("id_b"))
      .select(col("doc_id").as("id_a"), col("id_b"))
    val allPairs = nearPairs.select("id_a", "id_b").union(exactPairs)
    val comps = DedupClusters.connectedComponents(allPairs, "id_a", "id_b")
    val reference = docs.select(col("doc_id"))
      .join(comps, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster_id"))
    assert(viaPipeline.except(reference).count() === 0)
    assert(reference.except(viaPipeline).count() === 0)
  }

  test("curate: doc-level drop then span excision — the dup doc drops whole, the shared span excises from the later keeper only") {
    val docs = Seq(
      (1L, "a b c d e f"),                // keeper of the exact pair
      (2L, "a b c d e f"),                // exact duplicate -> dropped whole
      (10L, "x y z s1 s2 s3 q r"),        // first occurrence of the shared span
      (20L, "m n s1 s2 s3 o p")           // later occurrence -> span excised
    ).toDF("doc_id", "text")
    val out = DedupPipeline.curate(docs, threshold = 0.9,
      spanWindow = 3, spanMinDupCount = 2L).cache()
    assert(out.count() === 4, "every input document comes back labeled")
    val byDoc = out.select("doc_id", "keep", "text", "n_tokens", "removed_tokens")
      .as[(Long, Boolean, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // the exact duplicate drops at doc level, text untouched
    assert(byDoc(1L) === ((1L, true, "a b c d e f", 6L, 0L)))
    assert(byDoc(2L) === ((2L, false, "a b c d e f", 6L, 0L)))
    // the shared 3-word span keeps its globally-first occurrence (doc
    // 10, position 3 sorts before doc 20, position 2 on (doc, p)) and
    // excises the later one — the signal doc-level dedup cannot see
    assert(byDoc(10L) === ((10L, true, "x y z s1 s2 s3 q r", 8L, 0L)))
    assert(byDoc(20L) === ((20L, true, "m n o p", 4L, 3L)))
  }

  test("curate with lineMinDocs: pages differing only in boilerplate collapse to exact duplicates") {
    // d1/d2 share the same body but carry DIFFERENT banners; each
    // banner appears on THREE pages so it flags at minDocs=3, while
    // the shared body line sits on only two pages and survives —
    // after the line stage d1 and d2 are byte-identical
    val docs = Seq(
      (1L, "Please accept our many cookies now\nalpha beta gamma delta epsilon zeta"),
      (2L, "Subscribe to the newsletter today friends\nalpha beta gamma delta epsilon zeta"),
      (3L, "Please accept our many cookies now\ncompletely unrelated junk page words"),
      (4L, "Subscribe to the newsletter today friends\nother unrelated junk entirely here"),
      (5L, "Please accept our many cookies now\nfifth page distinct content words here"),
      (6L, "Subscribe to the newsletter today friends\nsixth page some different words again")
    ).toDF("doc_id", "text")
    // without the line stage the banners keep Jaccard below 0.9: all
    // six docs stay their own cluster
    val without = DedupPipeline.curate(docs, threshold = 0.9, spanWindow = 50)
    assert(without.filter(col("keep")).count() === 6)
    // with it, d2 collapses into d1's exact group and drops
    val withLine = DedupPipeline.curate(docs, threshold = 0.9,
      spanWindow = 50, lineMinDocs = 3L).cache()
    val byDoc = withLine.select("doc_id", "cluster_id", "keep", "text")
      .as[(Long, Long, Boolean, String)].collect().map(r => r._1 -> r).toMap
    assert(byDoc(1L) === ((1L, 1L, true, "alpha beta gamma delta epsilon zeta")))
    assert(byDoc(2L) === ((2L, 1L, false, "alpha beta gamma delta epsilon zeta")))
    assert(byDoc(3L)._3 && byDoc(4L)._3)
    assert(!byDoc(3L)._4.contains("cookies") && !byDoc(4L)._4.contains("newsletter"),
      "every stage after the opt-in must see cleaned text")
    intercept[IllegalArgumentException] {
      DedupPipeline.curate(docs, lineMinDocs = 1L)
    }
  }

  test("curate with lineMinDocs ≡ dedupLines then curate, on the real corpus", graft.Slow) {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    // universal chrome on every page — flagged at any minDocs
    val seeded = docs.select(col("doc_id"),
      concat(lit("NAVBAR HOME ABOUT\n"), col("text"),
        lit("\nCOPYRIGHT ALL RIGHTS RESERVED")).as("text")).cache()
    val viaOne = DedupPipeline.curate(seeded, threshold = 0.5,
      spanWindow = 8, lineMinDocs = 2L).cache()
    val sequential = DedupPipeline.curate(
      LineDedup.dedupLines(seeded, minDocs = 2L).select("doc_id", "text"),
      threshold = 0.5, spanWindow = 8)
    assert(viaOne.except(sequential).count() === 0)
    assert(sequential.except(viaOne).count() === 0)
    assert(viaOne.filter(col("text").contains("NAVBAR")).count() === 0,
      "the chrome must actually be gone or the test is vacuous")
  }

  test("curate ≡ dedup then spanDedup over the keepers, on the real corpus; labels unchanged", graft.Slow) {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val viaCurate = DedupPipeline.curate(docs, threshold = 0.5,
      spanWindow = 8, spanMinDupCount = 2L).cache()
    val labels = DedupPipeline.dedup(docs, threshold = 0.5).cache()
    // the labels half is exactly dedup's output
    assert(viaCurate.select("doc_id", "cluster_id", "keep")
      .except(labels).count() === 0)
    assert(labels.except(
      viaCurate.select("doc_id", "cluster_id", "keep")).count() === 0)
    // the keeper half is exactly the sequential composition
    val keepers = docs.join(labels.filter(col("keep")).select("doc_id"), Seq("doc_id"))
    val sequential = SpanDup.spanDedup(keepers, 8, 2L)
      .select("doc_id", "text", "n_tokens", "removed_tokens")
    val curateKeepers = viaCurate.filter(col("keep"))
      .select("doc_id", "text", "n_tokens", "removed_tokens")
    assert(curateKeepers.except(sequential).count() === 0)
    assert(sequential.except(curateKeepers).count() === 0)
    // dropped docs pass through with original text and zero removal
    val dropped = viaCurate.filter(!col("keep"))
      .join(docs.select(col("doc_id"), col("text").as("_orig")), Seq("doc_id"))
    assert(dropped.filter(col("text") =!= col("_orig") ||
      col("removed_tokens") =!= 0L).count() === 0)
  }
}
