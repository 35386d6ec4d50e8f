package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** G27 record linkage: blocking semantics (multi-key union, loud block
  * cap, null keys), exact score arithmetic with fail-closed nulls, the
  * transitive-closure property, and the derived-roster gate shape. */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  test("candidatePairs: multi-key union dedup, null keys out, loud block cap") {
    val recs = Seq(
      (1L, "z1", "p1"), (2L, "z1", "p2"), (3L, "z2", "p2"),
      (4L, null.asInstanceOf[String], "p3"), (5L, null.asInstanceOf[String], "p3")
    ).toDF("id", "zip", "phone")
    val pairs = RecordLinkage.candidatePairs(recs, "id",
        Seq(col("zip"), col("phone")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // zip: (1,2); phone: (2,3), (4,5); null zips never pair on zip
    assert(pairs === Set((1L, 2L), (2L, 3L), (4L, 5L)))

    // a pair matching BOTH keys appears once
    val both = Seq((1L, "z", "p"), (2L, "z", "p")).toDF("id", "zip", "phone")
    assert(RecordLinkage.candidatePairs(both, "id",
      Seq(col("zip"), col("phone"))).count() === 1)

    // a degenerate block fails loudly instead of going quadratic
    val degenerate = (1L to 50L).map(i => (i, "same")).toDF("id", "zip")
    val e = intercept[Exception] {
      RecordLinkage.candidatePairs(degenerate, "id", Seq(col("zip")),
        maxBlockSize = 10).collect() }
    assert(e.getMessage.contains("maxBlockSize") ||
      Option(e.getCause).exists(_.getMessage.contains("maxBlockSize")))
  }

  test("scorePairs: exact fuzzy/exact arithmetic, nulls fail closed, weight guard") {
    val recs = Seq(
      (1L, "abcd", Some("X")), (2L, "abcx", Some("X")),
      (3L, "abcd", Option.empty[String])).toDF("id", "name", "seg")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val scores = RecordLinkage.scorePairs(recs, pairs, "id",
        Seq(RecordLinkage.Fuzzy("name", 0.5), RecordLinkage.Exact("seg", 0.5)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // (1,2): lev 1 over len 4 -> 0.75 fuzzy; seg equal -> 0.5 + 0.375
    assert(scores((1L, 2L)) === 0.5 * 0.75 + 0.5 * 1.0)
    // (1,3): identical names, but the null seg contributes 0 (fail closed)
    assert(scores((1L, 3L)) === 0.5 * 1.0)
    intercept[IllegalArgumentException] {
      RecordLinkage.scorePairs(recs, pairs, "id",
        Seq(RecordLinkage.Fuzzy("name", 0.9))) } // weights must sum to 1
  }

  test("scorePairsThresholded ≡ scorePairs.filter — set AND bit-exact " +
    "scores, nulls and boundary pairs included") {
    // a spread of distances around the prune band (threshold 0.75,
    // fuzzy weight 0.5 → band reaches maxlen: unprunable; threshold
    // 0.9 → band ~len/5: prunable), plus null fields on either side
    val recs = Seq(
      (1L, "abcdefgh", Some("X")), (2L, "abcdefgx", Some("X")), // lev 1
      (3L, "abcdxxxx", Some("X")), // lev 4 from 1
      (4L, "zzzzzzzz", Some("Y")), // lev 8 from 1
      (5L, null.asInstanceOf[String], Some("X")), // null fuzzy side
      (6L, "abcdefgh", Option.empty[String]) // null exact side
    ).toDF("id", "name", "seg")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    for (t <- Seq(0.9, 0.75, 0.5, 0.2)) {
      val fields = Seq(RecordLinkage.Fuzzy("name", 0.75),
        RecordLinkage.Exact("seg", 0.25))
      val ref = RecordLinkage.scorePairs(recs, pairs, "id", fields)
        .filter(col("score") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      val got = RecordLinkage
        .scorePairsThresholded(recs, pairs, "id", fields, t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      assert(got === ref, s"threshold $t") // bit-exact doubles via ===
    }
  }

  test("link: transitive closure merges chains, min-id keeps, singletons stand") {
    // A~B and B~C are each within edit 1; A~C is at edit 2 and alone
    // would miss the threshold — CC must still merge all three
    val recs = Seq(
      (10L, "linkaa", "s"), (11L, "linkab", "s"), (12L, "linkbb", "s"),
      (99L, "other0", "s")).toDF("id", "name", "seg")
    val out = RecordLinkage.link(recs, "id", Seq(col("seg")),
        Seq(RecordLinkage.Fuzzy("name", 1.0)), threshold = 0.8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // lev(linkaa, linkab)=1 -> 5/6 >= .8; lev(linkab, linkbb)=1;
    // lev(linkaa, linkbb)=2 -> 4/6 < .8; lev(other0, link**)>=4
    assert(out(10L) === ((10L, true)))
    assert(out(11L) === ((10L, false)) && out(12L) === ((10L, false)),
      s"chain must merge transitively: $out")
    assert(out(99L) === ((99L, true)), "singleton is its own entity")
  }

  test("linkAgainst: frozen labels win, delta-only entities form, no old-old pairs") {
    // frozen roster: entity 5 = {5, 6}; entity 20 = {20}; 30 and 31 are
    // IDENTICAL records in different frozen entities — a delta refresh
    // must never re-verify that old-old pair
    val entities = Seq(
      (5L, "frozenaa", "s", 5L), (6L, "frozenab", "s", 5L),
      (20L, "loneword", "s", 20L),
      (30L, "samesame", "s", 30L), (31L, "samesame", "s", 31L)
    ).toDF("id", "name", "seg", "entity_id")
    val delta = Seq(
      (1L, "frozenac", "s"),   // matches entity 5's members; 1 < 5!
      (40L, "newpairx", "s"), (41L, "newpairy", "s"), // delta-delta entity
      (50L, "isolated", "s")   // singleton
    ).toDF("id", "name", "seg")
    val out = RecordLinkage.linkAgainst(entities, delta, "id",
      Seq(col("seg")), Seq(RecordLinkage.Fuzzy("name", 1.0)), threshold = 0.8)
    val a = out.assignments.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      .toMap
    // the frozen label wins even though the delta id is smaller — a full
    // re-link would canonicalize to min id 1; the delta form must not
    assert(a(1L) === ((5L, false, false)), s"frozen label must win: $a")
    assert(a(40L)._1 === 40L && a(40L)._2 === true)
    assert(a(41L)._1 === 40L, "delta-delta pair shares the min delta id")
    assert(a(50L) === ((50L, true, false)))
    // identical old records in different entities stayed put: no merges
    assert(out.mergeCandidates.count() === 0,
      "old-old evidence must never surface from a delta refresh")
  }

  test("linkAgainst: the block cap fires only on delta-touched blocks") {
    // 30 frozen records share one block — oversized, but the delta
    // never touches it, so the refresh must still succeed
    val entities = ((1L to 30L).map(i => (i, s"name$i", "big", i)) :+
      ((100L, "target", "small", 100L))).toDF("id", "name", "seg", "entity_id")
    val delta = Seq((200L, "target", "small")).toDF("id", "name", "seg")
    val out = RecordLinkage.linkAgainst(entities, delta, "id",
      Seq(col("seg")), Seq(RecordLinkage.Fuzzy("name", 1.0)),
      threshold = 0.8, maxBlockSize = 10)
    assert(out.assignments.collect().head.getLong(1) === 100L)
    // ...but a delta landing IN the oversized block fails loudly
    val deltaHot = Seq((201L, "name1", "big")).toDF("id", "name", "seg")
    val e = intercept[Exception] {
      RecordLinkage.linkAgainst(entities, deltaHot, "id",
        Seq(col("seg")), Seq(RecordLinkage.Fuzzy("name", 1.0)),
        threshold = 0.8, maxBlockSize = 10).assignments.collect() }
    assert(e.getMessage.contains("maxBlockSize") ||
      Option(e.getCause).exists(_.getMessage.contains("maxBlockSize")))
  }

  test("linkAgainst: a bridging delta reports merges without relabeling") {
    val entities = Seq(
      (5L, "bridgeaa", "s", 5L), (9L, "bridgeab", "s", 9L)
    ).toDF("id", "name", "seg", "entity_id")
    val delta = Seq((100L, "bridgeaa", "s")).toDF("id", "name", "seg")
    val out = RecordLinkage.linkAgainst(entities, delta, "id",
      Seq(col("seg")), Seq(RecordLinkage.Fuzzy("name", 1.0)), threshold = 0.8)
    val a = out.assignments.collect().head
    assert(a.getLong(1) === 5L && a.getBoolean(3), "bridged delta takes min entity")
    val m = out.mergeCandidates.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m === Set((9L, 5L)), "the bridge is reported, not applied")

    // the rebuild (full link over everything) realizes the merge: the
    // delta form and the rebuild agree on the PARTITION of records
    val all = entities.drop("entity_id").unionByName(delta)
    val rebuilt = RecordLinkage.link(all, "id", Seq(col("seg")),
        Seq(RecordLinkage.Fuzzy("name", 1.0)), threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rebuilt(5L) === rebuilt(9L) && rebuilt(9L) === rebuilt(100L),
      "rebuild merges what the delta form reported")
  }

  test("derived roster: every planted duplicate links to exactly its source") {
    val out = RecordLinkage.recordLink(spark, sf).cache()
    val base = Tables.load(spark, sf, "customer").select("c_custkey")
    assert(out.count() === base.count() + base.filter(col("c_custkey") % 10 === 0).count())
    // every planted dupe (id >= 100000) resolves to an entity led by a
    // base record, and its source is in the same entity
    val dupes = out.filter(col("id") >= 100000L)
      .select(col("id"), col("entity_id"))
      .collect()
    assert(dupes.nonEmpty)
    val entityOf = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    dupes.foreach { r =>
      val src = r.getLong(0) - 100000L
      assert(r.getLong(1) === entityOf(src),
        s"dupe ${r.getLong(0)} not linked to source $src")
    }
    // keepers are exactly the entity leaders
    assert(out.filter(col("keep") =!= (col("id") === col("entity_id")))
      .count() === 0)
  }

  test("goldenRecords: rule semantics — longest/mode/max/min/latest, " +
    "nulls never survive, ties break to the largest value") {
    import RecordLinkage._
    val recs = Seq(
      // entity 1: longest name "ccccc"; mode seg "A" (2 vs 1);
      // bal max 9.0 / min 1.0; latest (by ver) name is "bb"
      (1L, "aaa", "A", 1.0, 10L), (2L, "bb", "A", 9.0, 30L),
      (3L, "ccccc", "B", 5.0, 20L),
      // entity 2: name ties at len 3 -> larger string "zzz"; seg ties
      // 1-1 -> larger value "Y"; one null name ignored
      (4L, "xxx", "X", 2.0, 1L), (5L, "zzz", "Y", 3.0, 2L),
      (6L, null.asInstanceOf[String], null.asInstanceOf[String], 4.0, 3L),
      // entity 3: all-null name survives as null
      (7L, null.asInstanceOf[String], "Q", 7.0, 5L)
    ).toDF("id", "name", "seg", "bal", "ver")
    val assign = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L), (6L, 20L), (7L, 30L)).toDF("id", "entity_id")
    val g = goldenRecords(recs, "id", assign,
        Seq(Longest("name"), Mode("seg"), MaxOf("bal"), MinOf("ver")))
      .select("entity_id", "n_members", "name", "seg", "bal", "ver")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getString(3),
          r.getDouble(4), r.getLong(5))).toMap
    assert(g(10L) === ((3L, "ccccc", "A", 9.0, 10L)))
    assert(g(20L) === ((3L, "zzz", "Y", 4.0, 1L)))
    assert(g(30L)._2 === null) // all-null field -> null, never a crash
    assert(g(30L)._3 === "Q")

    val latest = goldenRecords(recs, "id", assign,
        Seq(LatestBy("name", "ver")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(latest(10L) === "bb")   // ver 30 carries "bb"
    assert(latest(20L) === "zzz")  // null-name ver 3 row never wins
    assert(latest(30L) === null)

    intercept[IllegalArgumentException] {
      goldenRecords(recs, "id", assign,
        Seq(MaxOf("bal"), MinOf("bal"))) } // one rule per field
  }

  test("goldenRecords composes with link: the merged entity keeps the " +
    "longest name across source and typo'd dupe") {
    val recs = Seq(
      (1L, "cust_alpha_long", "s"), (2L, "cust_alpha_lon", "s"),
      (9L, "unrelated_zzzz", "s")).toDF("id", "name", "seg")
    val assign = RecordLinkage.link(recs, "id", Seq(col("seg")),
      Seq(RecordLinkage.Fuzzy("name", 1.0)), threshold = 0.9)
    val g = RecordLinkage.goldenRecords(recs, "id", assign,
        Seq(RecordLinkage.Longest("name")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(g(1L) === ((2L, "cust_alpha_long"))) // merged pair, longest kept
    assert(g(9L) === ((1L, "unrelated_zzzz")))  // singleton passes through
  }
}
