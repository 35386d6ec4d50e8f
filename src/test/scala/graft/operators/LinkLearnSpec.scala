package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import RecordLinkage._
import LinkLearn._

/** r11 directives 3+4: unlabeled Fellegi-Sunter EM producing the
  * scorePairs weight vector (F1 >= hand weights on the record_link
  * fixture, fresh-session parity), and the recall-rescue blocking
  * schemes (q-gram, sorted-neighborhood) on seeded typo'd keys where
  * exact-key blocking provably misses pairs. */
class LinkLearnSpec extends SparkSpec {
  import spark.implicits._

  // ---- the record_link fixture (the gate's derived dirty roster) ----------

  // The record_link gate roster plus a third field ("code", copied
  // verbatim by duplicates, essentially never shared by strangers):
  // Fellegi-Sunter over binary agreements needs >= 3 fields to be
  // identifiable (fit enforces it), which real rosters trivially have.
  private lazy val roster: DataFrame = {
    val base = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("id"),
        concat(lit("cust_"), col("c_custkey"), lit("_"),
          substring(md5(col("c_custkey").cast("string")), 1, 6)).as("name"),
        col("c_nationkey").as("block"), col("c_mktsegment").as("seg"),
        substring(md5(concat(lit("code"),
          col("c_custkey").cast("string"))), 1, 8).as("code"))
    val dupes = base.filter(col("id") % 10 === 0)
      .select((col("id") + 100000L).as("id"),
        concat(lit("kust_"), expr("substring(name, 6)")).as("name"),
        col("block"), col("seg"), col("code"))
    base.unionByName(dupes).cache()
  }

  private lazy val truePairs: Set[(Long, Long)] =
    roster.filter(col("id") >= 100000L).select("id")
      .as[Long].collect().map(d => (d - 100000L, d)).toSet

  private def predictedPairs(linked: DataFrame): Set[(Long, Long)] = {
    val byEntity = linked.select("id", "entity_id").as[(Long, Long)]
      .collect().groupBy(_._2).values
    byEntity.flatMap { members =>
      val ids = members.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        yield (ids(i), ids(j))
    }.toSet
  }

  private def f1(pred: Set[(Long, Long)]): Double = {
    if (pred.isEmpty) return 0.0
    val tp = (pred intersect truePairs).size.toDouble
    val prec = tp / pred.size
    val rec = tp / truePairs.size
    if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
  }

  private val uniformFields =
    Seq(Fuzzy("name", 1.0 / 3), Exact("seg", 1.0 / 3),
      Exact("code", 1.0 / 3))

  test("EM finds the match structure without labels: name discriminates " +
    "hard, segment weakly, p is the planted duplicate rate") {
    val cands = candidatePairs(roster, "id", Seq(col("block")))
    val model = fit(roster, cands, "id", uniformFields)
    val name = model.fields.find(_.name == "name").get
    val seg = model.fields.find(_.name == "seg").get
    // matches agree on name, random block-mates don't
    assert(name.m > 0.9 && name.u < 0.1, model.toString)
    // every planted dupe copies its segment; random agreement ~ 1/5
    assert(seg.m > 0.9, model.toString)
    assert(seg.u > 0.05 && seg.u < 0.45, model.toString)
    // the learned weight vector puts most mass on the name
    val w = model.toFieldSims.map(f => f.colName -> f.weight).toMap
    assert(math.abs(w.values.sum - 1.0) < 1e-9)
    assert(w("name") > w("seg"), w.toString)
    // p tracks the true match fraction among candidates
    val nTrue = truePairs.size.toDouble
    val nCand = cands.count().toDouble
    assert(model.p > 0.2 * nTrue / nCand && model.p < 5 * nTrue / nCand,
      s"p=${model.p}, true rate=${nTrue / nCand}")
  }

  test("learned weights recover the planted duplicates with F1 >= the " +
    "hand-tuned gate weights") {
    val cands = candidatePairs(roster, "id", Seq(col("block")))
    val model = fit(roster, cands, "id", uniformFields)
    val handF1 = f1(predictedPairs(linkWithPairs(roster, "id", cands,
      Seq(Fuzzy("name", 0.75), Exact("seg", 0.25)), threshold = 0.9)))
    val learnedF1 = f1(predictedPairs(linkWithPairs(roster, "id", cands,
      model.toFieldSims, model.scoreThreshold())))
    assert(learnedF1 >= handF1,
      s"learned F1 $learnedF1 < hand F1 $handF1")
    assert(learnedF1 > 0.95, s"learned F1 $learnedF1")
  }

  test("model round-trips through the ModelStore: fresh-session parity " +
    "of weights and threshold, keep-two retention") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-linkmodel").toString
    val cands = candidatePairs(roster, "id", Seq(col("block")))
    val model = fit(roster, cands, "id", uniformFields)
    save(model, spark, dir)
    val back = load(spark, dir)
    assert(back == model.copy(fields = model.fields.sortBy(_.name)))
    assert(back.toFieldSims.toSet == model.toFieldSims.toSet)
    assert(back.scoreThreshold() == model.scoreThreshold())
    // a second save supersedes; the load still follows _meta
    save(back, spark, dir)
    assert(load(spark, dir) == back.copy(fields = back.fields.sortBy(_.name)))
  }

  test("scoreThreshold maps the posterior cutoff monotonically and " +
    "binarized FS scoring respects it") {
    val cands = candidatePairs(roster, "id", Seq(col("block")))
    val model = fit(roster, cands, "id", uniformFields)
    val t50 = model.scoreThreshold(0.5)
    val t99 = model.scoreThreshold(0.99)
    assert(t50 <= t99, s"$t50 > $t99")
    assert(t50 > 0 && t99 <= 1.0)
  }

  // ---- finer blocking (directive 4) ----------------------------------------

  /** 200 records with distinctive names and a 5-digit zip; 20 planted
    * duplicates whose TYPO hits both the name (one late character) and
    * the zip (one digit) — the classic dirty roster where the exact
    * zip block provably misses every planted pair. */
  private lazy val dirty: DataFrame = {
    val base = (0 until 200).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (i.toLong, f"rec$i%04d_$h", f"${10000 + i * 37 % 90000}%05d")
    }
    val dup = base.filter(_._1 % 10 == 0).map { case (i, name, zip) =>
      // flip the LAST name character and the LAST zip digit
      (i + 10000L,
        name.dropRight(1) + (if (name.last == 'x') 'y' else 'x'),
        zip.dropRight(1) + (if (zip.last == '9') '0' else '9'))
    }
    (base ++ dup).toDF("id", "name", "zip").cache()
  }

  private lazy val dirtyTrue: Set[(Long, Long)] =
    (0 until 200).filter(_ % 10 == 0).map(i => (i.toLong, i + 10000L)).toSet

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("exact zip blocking provably misses every typo'd duplicate") {
    val exact = pairSet(candidatePairs(dirty, "id", Seq(col("zip"))))
    assert((exact intersect dirtyTrue).isEmpty,
      "fixture broken: exact blocking found a typo'd pair")
  }

  test("q-gram blocking recovers every typo'd duplicate within the df cap") {
    val qg = qgramPairs(dirty, "id", "name", q = 3, dfCap = 50)
    val got = pairSet(qg)
    assert(dirtyTrue.subsetOf(got),
      s"missed ${(dirtyTrue diff got).size} of ${dirtyTrue.size}")
    // df-capped: the shared "rec0" prefix grams (df ~ all rows) are
    // dropped, so candidates stay subquadratic
    val n = dirty.count()
    assert(qg.count() < n * (n - 1) / 4,
      s"q-gram candidates ${qg.count()} look all-pairs")
  }

  test("sorted-neighborhood blocking recovers every typo'd duplicate " +
    "within the O(n*window) bound") {
    val sn = sortedNeighborhoodPairs(dirty, "id", col("name"), window = 8)
    val got = pairSet(sn)
    assert(dirtyTrue.subsetOf(got),
      s"missed ${(dirtyTrue diff got).size} of ${dirtyTrue.size}")
    assert(sn.count() <= dirty.count() * 8,
      s"${sn.count()} pairs exceeds n*window")
  }

  test("the rescued pairs link end-to-end through linkWithPairs") {
    val sn = sortedNeighborhoodPairs(dirty, "id", col("name"), window = 8)
    val linked = linkWithPairs(dirty, "id", sn,
      Seq(Fuzzy("name", 0.8), Fuzzy("zip", 0.2)), threshold = 0.85)
    val pred = predictedPairsOf(linked)
    assert(dirtyTrue.subsetOf(pred),
      s"missed ${(dirtyTrue diff pred).size}")
    // and nothing spurious merged: every entity is a true pair or a
    // singleton
    assert((pred diff dirtyTrue).isEmpty, (pred diff dirtyTrue).toString)
  }

  private def predictedPairsOf(linked: DataFrame): Set[(Long, Long)] = {
    val byEntity = linked.select("id", "entity_id").as[(Long, Long)]
      .collect().groupBy(_._2).values
    byEntity.flatMap { members =>
      val ids = members.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        yield (ids(i), ids(j))
    }.toSet
  }

  test("multi-pass blocking composes: union of exact + q-gram candidates " +
    "feeds one linkWithPairs") {
    val both = candidatePairs(dirty, "id", Seq(col("zip")))
      .unionByName(qgramPairs(dirty, "id", "name", q = 3, dfCap = 50))
      .distinct()
    val linked = linkWithPairs(dirty, "id", both,
      Seq(Fuzzy("name", 0.8), Fuzzy("zip", 0.2)), threshold = 0.85)
    assert(dirtyTrue.subsetOf(predictedPairsOf(linked)))
  }
}
