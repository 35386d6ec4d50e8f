package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The persisted index must be indistinguishable from the transient
  * path at query time — build once, query forever, same answers. */
class IvfIndexSpec extends SparkSpec {

  private def tmpPath(): String =
    java.nio.file.Files.createTempDirectory("graft-ivfidx").toString

  private def sameResult(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.except(b).count() === 0 && b.except(a).count() === 0,
      "persisted and transient results diverged")
    assert(a.count() === b.count())
  }

  test("load(path).topK equals ivfPqTopK at equal seed/params, from a fresh session") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val queries = vecs.filter(col("vec_id") % 10 === 0)
    val transient = IvfPq.ivfPqTopK(vecs, queries, "vec_id", k = 5,
      nlist = 8, nprobe = 4).cache()
    assert(transient.count() > 0)

    val path = tmpPath()
    IvfIndex.build(vecs, "vec_id", path, nlist = 8)

    // query from a FRESH session: nothing driver-resident from the
    // build (model, codebook, sample) survives — everything must come
    // off the stored artifacts (the G6 restart discipline)
    val s2 = spark.newSession()
    val idx = IvfIndex.load(s2, path)
    val q2 = Tables.embeddings(s2, sf).select("vec_id", "embedding")
      .filter(col("vec_id") % 10 === 0)
    val persisted = idx.topK(q2, "vec_id", k = 5, nprobe = 4).cache()
    sameResult(persisted, transient)
  }

  test("BOTH store scans (codes AND raw vectors) read only probed list partitions") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val path = tmpPath()
    IvfIndex.build(vecs, "vec_id", path, nlist = 8)
    val idx = IvfIndex.load(spark, path)
    val one = vecs.filter(col("vec_id") === 0)
    val res = idx.topK(one, "vec_id", k = 3, nprobe = 2)
    res.collect()
    val lines = res.queryExecution.executedPlan.toString.split('\n')
    // the isin over the partition column must surface as a partition
    // filter on EACH store scan — nprobe of nlist partitions read, the
    // rest pruned at planning time. The codes scan always pruned; the
    // raw-vector scan is the one that used to read the store whole
    // (the last corpus-sized read in the serving path).
    for (store <- Seq("/codes/", "/vectors/")) {
      val scans = lines.filter(l => l.contains("FileScan") && l.contains(store))
      assert(scans.nonEmpty, s"no FileScan over $store in plan:\n${lines.mkString("\n")}")
      scans.foreach { l =>
        val pf = l.indexOf("PartitionFilters:")
        assert(pf >= 0 && l.substring(pf).takeWhile(_ != ']').contains("list_id"),
          s"scan over $store not pruned by list_id:\n$l")
      }
    }
  }

  test("add appends a committed batch; queries then match a full transient rebuild", graft.Slow) {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val cut = 400L
    val oldVecs = vecs.filter(col("vec_id") < cut)
    val newVecs = vecs.filter(col("vec_id") >= cut)
    assert(newVecs.count() > 0, "test needs a non-empty delta")
    val queries = vecs.filter(col("vec_id") % 10 === 0)

    val path = tmpPath()
    IvfIndex.build(oldVecs, "vec_id", path, nlist = 8)
    val idx = IvfIndex.load(spark, path)
    assert(idx.add(newVecs, "vec_id") === newVecs.count())
    assert(idx.batches === Seq(0, 1))
    val a = idx.topK(queries, "vec_id", k = 5, nprobe = 4).cache()

    // the reference: the same artifacts composed transiently — centroids
    // and codebooks trained on oldVecs (what build saw), inverted lists
    // holding the FULL corpus (what build+add hold). ivfPqTopK can't
    // express that split (it trains on what it indexes), but the shared
    // plan pieces can; this also pins add's SQL coarse assignment to the
    // trainer's own (model.transform) on real data.
    val n = oldVecs.count()
    val model = IvfSearch.trainModel(oldVecs, n, nlist = 8, seed = 42L,
      maxTrainRows = 50000L)
    val sample = IvfPq.pqSample(oldVecs, n, ksub = 64,
      maxTrainRows = 50000L, seed = 42L)
    val cbLit = lit(IvfPq.trainCodebooks(sample, 16, 64,
      sample.head.length / 16, seed = 42L))
    val b = IvfPq.pqRank(
      IvfPq.probeSide(queries, "vec_id", IvfPq.centroidsFrame(model, spark),
        cbLit, 16, 64, nprobe = 4, saltFactor = 4),
      IvfPq.codedCorpus(vecs, "vec_id", model, cbLit, 16, 64, saltFactor = 4),
      vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("ec")),
      queries.select(col("vec_id").as("query_id"), col("embedding").as("eq")),
      k = 5, rerankFactor = 8)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    // and the added vectors are actually reachable: a query vector from
    // the delta must find neighbors, and appear as one
    assert(a.filter(col("query_id") >= cut).count() > 0)
    assert(a.filter(col("neighbor_id") >= cut).count() > 0)
  }

  test("a crashed add (no meta swap) is invisible; retry lands it once", graft.Slow) {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val cut = 400L
    val path = tmpPath()
    IvfIndex.build(vecs.filter(col("vec_id") < cut), "vec_id", path, nlist = 8)

    // simulate the crash: write the batch dirs exactly as add would,
    // but never swap _meta — capture the pre-add pointer bytes and
    // restore them verbatim (r17: _meta rides the checksummed pointer
    // format, so a raw string edit would read as a torn pointer)
    val metaFile = java.nio.file.Paths.get(path, "_meta")
    val preAdd = java.nio.file.Files.readAllBytes(metaFile)
    val idx0 = IvfIndex.load(spark, path)
    idx0.add(vecs.filter(col("vec_id") >= cut), "vec_id")
    java.nio.file.Files.write(metaFile, preAdd)
    // the raw rewrite bypassed Hadoop's checksummed local FS — drop the
    // stale sidecar so the read path doesn't flag OUR edit as corruption
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path, "._meta.crc"))

    val idx = IvfIndex.load(spark, path)
    assert(idx.batches === Seq(0), "uncommitted batch leaked into meta")
    val before = idx.topK(vecs.filter(col("vec_id") % 10 === 0), "vec_id", k = 5)
    assert(before.filter(col("neighbor_id") >= cut).count() === 0,
      "orphan batch visible to a reader")
    // retry: overwrites the orphan dirs under the same tag, commits once
    assert(idx.add(vecs.filter(col("vec_id") >= cut), "vec_id") > 0)
    assert(idx.batches === Seq(0, 1))
    val after = idx.topK(vecs.filter(col("vec_id") % 10 === 0), "vec_id", k = 5)
    assert(after.filter(col("neighbor_id") >= cut).count() > 0)
  }

  test("load on a missing or uncommitted path fails with a named error") {
    val e = intercept[IllegalArgumentException] {
      IvfIndex.load(spark, tmpPath())
    }
    assert(e.getMessage.contains("_meta"))
  }

  test("a held writer lock makes add fail loudly and write nothing") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val cut = 400L
    val path = tmpPath()
    IvfIndex.build(vecs.filter(col("vec_id") < cut), "vec_id", path, nlist = 8)
    val idx = IvfIndex.load(spark, path)
    // an in-flight writer holds the lock (what the loser of a race sees)
    val lock = java.nio.file.Paths.get(path, "_lock_add")
    java.nio.file.Files.createFile(lock)
    val e = intercept[IllegalStateException] {
      idx.add(vecs.filter(col("vec_id") >= cut), "vec_id")
    }
    assert(e.getMessage.contains("_lock_add"))
    assert(idx.batches === Seq(0), "failed add must not commit")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "codes", "batch=1")),
      "failed add must not write batch dirs")
    // the in-flight writer finishes (lock released) -> retry succeeds
    java.nio.file.Files.delete(lock)
    assert(idx.add(vecs.filter(col("vec_id") >= cut), "vec_id") > 0)
    assert(idx.batches === Seq(0, 1))
  }

  test("rebuild holds the writer lock: a held lock fails it loudly, and it releases on completion") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val path = tmpPath()
    IvfIndex.build(vecs.filter(col("vec_id") < 300), "vec_id", path, nlist = 4)
    val idx = IvfIndex.load(spark, path)
    // a concurrent add/compact in flight: rebuild must NOT scan under it
    // (two compactions completing during a long rebuild scan can purge
    // the generation the scan is reading — the ADVICE finding)
    val lock = java.nio.file.Paths.get(path, "_lock_add")
    java.nio.file.Files.createFile(lock)
    val e = intercept[IllegalStateException] { idx.rebuild(tmpPath()) }
    assert(e.getMessage.contains("_lock_add"))
    java.nio.file.Files.delete(lock)
    // released lock -> rebuild runs, commits the dest, and releases so
    // a subsequent writer proceeds
    val dest = tmpPath()
    idx.rebuild(dest, nlist = 4)
    assert(IvfIndex.load(spark, dest).batches.nonEmpty)
    assert(!java.nio.file.Files.exists(lock),
      "rebuild must release the writer lock when done")
    assert(idx.add(vecs.filter(col("vec_id") >= 300 && col("vec_id") < 350),
      "vec_id") > 0)
  }

  test("two concurrent adds: no silent drop — every committed add's vectors are visible") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val path = tmpPath()
    IvfIndex.build(vecs.filter(col("vec_id") < 300), "vec_id", path, nlist = 8)
    val d1 = vecs.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    val d2 = vecs.filter(col("vec_id") >= 400 && col("vec_id") < 500)
    // two independent handles (separate in-memory meta, same path) racing
    // — the pre-lock bug: both read batches=[0], both write batch=1, the
    // last meta swap silently drops the other's vectors
    val (h1, h2) = (IvfIndex.load(spark, path), IvfIndex.load(spark, path))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val results = Await.result(Future.sequence(Seq(
      Future(scala.util.Try(h1.add(d1, "vec_id"))),
      Future(scala.util.Try(h2.add(d2, "vec_id"))))), 300.seconds)
    // two legal outcomes: the adds overlap and the loser fails loudly,
    // or they happen not to overlap and both commit in sequence. What
    // must NEVER happen is the third, pre-lock outcome: both "succeed"
    // and one batch silently vanishes — caught below by batches-vs-wins.
    val losers = results.filter(_.isFailure)
    losers.foreach(l => assert(
      l.failed.get.isInstanceOf[IllegalStateException], s"unexpected: $l"))
    val wins = results.count(_.isSuccess)
    assert(wins >= 1, s"at least one add must win: $results")
    val idx = IvfIndex.load(spark, path)
    assert(idx.batches.size === 1 + wins,
      "committed batches must equal successful adds — no silent drop")
    // every successful add's vectors are reachable as neighbors
    val q = vecs.filter(col("vec_id") % 10 === 0)
    val res = idx.topK(q, "vec_id", k = 5, nprobe = 8).cache()
    if (results(0).isSuccess)
      assert(res.filter(col("neighbor_id").between(300, 399)).count() > 0)
    if (results(1).isSuccess)
      assert(res.filter(col("neighbor_id").between(400, 499)).count() > 0)
  }

  test("stats surfaces the imbalance a skewed add creates, from driver-bounded metadata") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val path = tmpPath()
    IvfIndex.build(vecs.filter(col("vec_id") < 400), "vec_id", path, nlist = 8)
    val idx = IvfIndex.load(spark, path)
    val before = idx.stats()
    assert(before.total === 400 && before.nlist === 8)
    assert(before.perList.values.sum === before.total)
    assert(before.perList.size <= before.nlist)

    // drift, deliberately extreme: 200 new vectors identical to one
    // existing embedding — frozen-centroid assignment crams every one
    // into a single list
    val one = vecs.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val skew = (1000 until 1200).map(i => (i.toLong, one)).toDF("vec_id", "embedding")
    idx.add(skew, "vec_id")
    val after = idx.stats()
    assert(after.total === 600 && after.batches === 2)
    assert(after.perList.values.sum === 600)
    assert(after.perList.exists { case (l, c) =>
        c - before.perList.getOrElse(l, 0L) == 200L },
      s"the skewed add must land whole in one list: before $before, after $after")
    assert(after.imbalance > before.imbalance,
      s"imbalance must expose the drift: before $before, after $after")
  }

  test("rebuild from the index's own vectors restores recall the drifted adds lost") {
    import spark.implicits._
    // four tight clusters on coordinate axes — the distribution the
    // index is built (and its centroids frozen) on
    val rnd = new scala.util.Random(7)
    def around(center: Array[Float], n: Int, base: Long) =
      (0 until n).map { i =>
        (base + i, center.map(c => c + (rnd.nextDouble() * 0.4 - 0.2).toFloat))
      }
    def axis(d: Int) = Array.tabulate(16)(i => if (i == d) 10f else 0f)
    val original = (0 until 4).flatMap(c => around(axis(c), 100, c * 100L))
    // the drift: a new cluster midway BETWEEN two frozen centroids, so
    // its members split across both lists on jitter sign — at nprobe=1
    // a drifted query reaches only its own half
    val mid = Array.tabulate(16)(i => if (i == 0 || i == 1) 5f else 0f)
    val drifted = around(mid, 200, 1000L)
    val all = (original ++ drifted).toDF("vec_id", "embedding").cache()

    val path = tmpPath()
    IvfIndex.build(original.toDF("vec_id", "embedding"), "vec_id", path,
      nlist = 4, ksub = 16)
    val idx = IvfIndex.load(spark, path)
    idx.add(drifted.toDF("vec_id", "embedding"), "vec_id")

    // ground truth: exact cosine top-10 per drifted query (self excluded,
    // the operator's own contract), computed directly on the 600 vectors
    val queries = drifted.take(20)
    val k = 10
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val corpus = original ++ drifted
    val exact: Map[Long, Set[Long]] = queries.map { case (qid, q) =>
      qid -> corpus.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    }.toMap
    // rerankFactor large enough that the exact re-rank covers every
    // probed candidate: the measured recall is then PURELY the coarse
    // quantizer's — which lists exist and which are probed — the thing
    // drift degrades and rebuild repairs (at the default factor the ADC
    // shortlist would confound it: near-identical drifted vectors share
    // one PQ code and tie-break by id)
    def recallOf(idx2: IvfIndex): Double = {
      val res = idx2.topK(queries.toDF("vec_id", "embedding"), "vec_id",
          k = k, nprobe = 1, rerankFactor = 30)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      queries.map { case (qid, _) =>
        (res.getOrElse(qid, Set.empty) & exact(qid)).size }.sum.toDouble /
        (queries.length * k)
    }

    val recallBefore = recallOf(idx)
    assert(recallBefore < 0.85,
      f"drift must actually hurt recall for this spec to mean anything: $recallBefore%.2f")
    assert(idx.stats().imbalance > 1.3, s"drift must show in stats: ${idx.stats()}")

    // the maintenance move: retrain from the index's own stored vectors
    // into a NEW path (nlist re-chosen for the grown corpus), repoint
    val next = tmpPath()
    idx.rebuild(next, nlist = 5)
    val rebuilt = IvfIndex.load(spark, next)
    val recallAfter = recallOf(rebuilt)
    assert(recallAfter > recallBefore,
      f"rebuild must restore recall: before $recallBefore%.2f after $recallAfter%.2f")
    assert(recallAfter >= 0.95,
      f"a centroid on the drifted cluster recovers the neighborhood: $recallAfter%.2f")
    // guard rails: rebuilding into the live path is refused
    val e = intercept[IllegalArgumentException] { idx.rebuild(path) }
    assert(e.getMessage.contains("live path"))
  }

  test("a crashed compact retries over its orphan dirs; an already-compact call purges the recorded generation", graft.Slow) {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val path = tmpPath()
    IvfIndex.build(vecs.filter(col("vec_id") < 250), "vec_id", path, nlist = 8)
    val idx = IvfIndex.load(spark, path)
    idx.add(vecs.filter(col("vec_id") >= 250 && col("vec_id") < 400), "vec_id")
    val q = vecs.filter(col("vec_id") % 10 === 0)
    val before = idx.topK(q, "vec_id", k = 5, nprobe = 4).cache()
    before.count()

    // simulate a compact that crashed after writing its batch=2 output
    // but before the _meta swap: orphan dirs exist under the SAME
    // generation id the retry recomputes from the unchanged meta — the
    // retry must overwrite them, not die on path-already-exists
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit =
      java.nio.file.Files.walk(from).forEach { p =>
        val dst = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
      }
    for (store <- Seq("codes", "vectors"))
      copyTree(java.nio.file.Paths.get(path, store, "batch=0"),
        java.nio.file.Paths.get(path, store, "batch=2"))
    assert(idx.compact() === 2, "retry over orphan compact dirs must succeed")
    assert(idx.batches === Seq(2))
    sameResult(idx.topK(q, "vec_id", k = 5, nprobe = 4).cache(), before)

    // already-compact: the generation the last compaction recorded has
    // had its one-compaction lazy-reader grace — purge it now instead of
    // retaining a full index copy until another add+compact cycle
    for (store <- Seq("codes", "vectors"); b <- Seq(0, 1))
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, store, s"batch=$b")),
        s"$store/batch=$b must survive until the next compact call")
    assert(idx.compact() === 0)
    for (store <- Seq("codes", "vectors"); b <- Seq(0, 1))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, store, s"batch=$b")),
        s"$store/batch=$b must be purged by the already-compact call")
    // the purge is committed: a fresh load agrees and queries still work
    val idx2 = IvfIndex.load(spark, path)
    assert(idx2.compact() === 0)
    sameResult(idx2.topK(q, "vec_id", k = 5, nprobe = 4).cache(), before)
  }

  test("compact folds batches into one generation: same answers, pruned orphans, adds continue", graft.Slow) {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val path = tmpPath()
    IvfIndex.build(vecs.filter(col("vec_id") < 250), "vec_id", path, nlist = 8)
    val idx = IvfIndex.load(spark, path)
    idx.add(vecs.filter(col("vec_id") >= 250 && col("vec_id") < 350), "vec_id")
    idx.add(vecs.filter(col("vec_id") >= 350 && col("vec_id") < 450), "vec_id")
    assert(idx.batches === Seq(0, 1, 2))
    val q = vecs.filter(col("vec_id") % 10 === 0)
    val before = idx.topK(q, "vec_id", k = 5, nprobe = 4).cache()
    before.count()

    // a LAZY frame built against the pre-compact batch list — must stay
    // readable across exactly one compaction (the G17 retention contract)
    val lazyPreCompact = idx.topK(q, "vec_id", k = 5, nprobe = 4)

    assert(idx.compact() === 3)
    assert(idx.batches === Seq(3))
    val after = idx.topK(q, "vec_id", k = 5, nprobe = 4).cache()
    sameResult(after, before)
    // keep-two-generations: the just-replaced dirs survive this compact
    // (lazy readers from the prior generation), and the lazy frame works
    for (store <- Seq("codes", "vectors"); b <- Seq(0, 1, 2))
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, store, s"batch=$b")),
        s"$store/batch=$b purged one generation early")
    sameResult(lazyPreCompact.cache(), before)
    // compact is a committed generation like any other: a fresh load
    // sees it, an idempotent re-compact is a no-op, and adds continue
    assert(IvfIndex.load(spark, path).batches === Seq(3))
    assert(idx.compact() === 0)
    assert(idx.add(vecs.filter(col("vec_id") >= 450 && col("vec_id") < 500),
      "vec_id") > 0)
    assert(idx.batches === Seq(3, 4))
    val withAdd = idx.topK(q, "vec_id", k = 5, nprobe = 8)
    assert(withAdd.filter(col("neighbor_id").between(450, 499)).count() > 0)

    // the NEXT compaction purges the generation before last from BOTH
    // stores and retains the one it just replaced
    assert(idx.compact() === 2)
    assert(idx.batches === Seq(5))
    for (store <- Seq("codes", "vectors")) {
      for (b <- Seq(0, 1, 2))
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(path, store, s"batch=$b")),
          s"$store/batch=$b survived two compactions")
      for (b <- Seq(3, 4))
        assert(java.nio.file.Files.exists(
          java.nio.file.Paths.get(path, store, s"batch=$b")),
          s"$store/batch=$b purged one generation early")
    }
    val finalRes = idx.topK(q, "vec_id", k = 5, nprobe = 8)
    assert(finalRes.filter(col("neighbor_id").between(450, 499)).count() > 0)
  }
}
