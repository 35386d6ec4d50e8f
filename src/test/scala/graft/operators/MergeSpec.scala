package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def kv(rows: (Long, String)*): DataFrame =
    rows.toDF("k", "v")

  private def asSet(df: DataFrame): Set[(Long, String)] =
    df.select("k", "v").as[(Long, String)].collect().toSet

  test("upsert: matched keys take the update row, unmatched target rows " +
    "survive, unmatched update rows insert") {
    val target = kv(1L -> "a", 2L -> "b", 3L -> "c")
    val updates = kv(2L -> "B2", 9L -> "new")
    assert(asSet(Merge.upsert(target, updates, "k")) ==
      Set(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "new"))
  }

  test("upsert: empty updates is the identity; empty target is the insert") {
    val target = kv(1L -> "a", 2L -> "b")
    assert(asSet(Merge.upsert(target, kv(), "k")) == asSet(target))
    assert(asSet(Merge.upsert(kv(), target, "k")) == asSet(target))
  }

  test("duplicate update keys raise inside the plan (MERGE ambiguity is " +
    "loud, the Delta convention)") {
    val target = kv(1L -> "a")
    val dup = kv(2L -> "x", 2L -> "y")
    val ex = intercept[Exception] {
      Merge.upsert(target, dup, "k").collect()
    }
    assert(ex.getMessage.contains("duplicate update key"), ex.getMessage)
  }

  test("upsert preserves unmatched target duplicates, collapses matched " +
    "keys to the single update row (keyed-table semantics)") {
    val target = kv(1L -> "a", 1L -> "a2", 2L -> "b", 2L -> "b2")
    val updates = kv(2L -> "B")
    val got = asSet(Merge.upsert(target, updates, "k"))
    assert(got == Set(1L -> "a", 1L -> "a2", 2L -> "B"))
  }

  test("applyChanges: deletes remove, upserts merge, unknown ops raise") {
    val target = kv(1L -> "a", 2L -> "b", 3L -> "c")
    val changes = Seq((2L, "B", "upsert"), (3L, null.asInstanceOf[String],
      "delete"), (4L, "d", "upsert")).toDF("k", "v", "_op")
    assert(asSet(Merge.applyChanges(target, changes, "k")) ==
      Set(1L -> "a", 2L -> "B", 4L -> "d"))
    val bad = Seq((1L, "x", "replace")).toDF("k", "v", "_op")
    val ex = intercept[Exception] {
      Merge.applyChanges(target, bad, "k").collect()
    }
    assert(ex.getMessage.contains("unknown MERGE op"), ex.getMessage)
  }

  test("changeSet emits exactly added/changed as upserts and removed as " +
    "deletes; unchanged keys are absent") {
    val old = kv(1L -> "a", 2L -> "b", 3L -> "c")
    val cur = kv(2L -> "b", 3L -> "C3", 4L -> "d")
    val cs = Merge.changeSet(old, cur, "k")
      .as[(Long, String, String)].collect().toSet
    assert(cs == Set((1L, null, "delete"), (3L, "C3", "upsert"),
      (4L, "d", "upsert")))
  }

  test("round-trip law: applyChanges(old, changeSet(old, cur)) == cur, " +
    "exact and byHash, on the real corpus") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    val old = docs.filter($"doc_id" % 7 =!= 2)
    val cur = docs.filter($"doc_id" % 7 =!= 1)
      .withColumn("text", when($"doc_id" % 5 === 0,
        concat($"text", lit(" [rev2]"))).otherwise($"text"))
    val want = cur.as[(Long, String, String)].collect().sorted.toSeq
    Seq(false, true).foreach { byHash =>
      val cs = Merge.changeSet(old, cur, "doc_id", byHash = byHash)
      val got = Merge.applyChanges(old, cs, "doc_id")
        .as[(Long, String, String)].collect().sorted.toSeq
      assert(got == want, s"round-trip broke for byHash=$byHash")
    }
  }

  test("changeSet is MINIMAL: feed size == |added| + |changed| + |removed| " +
    "from SnapshotDiff on the same snapshots") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val old = docs.filter($"doc_id" % 7 =!= 2)
    val cur = docs.filter($"doc_id" % 7 =!= 1)
      .withColumn("text", when($"doc_id" % 5 === 0,
        concat($"text", lit(" [rev2]"))).otherwise($"text"))
    val byStatus = SnapshotDiff.diff(old, cur, "doc_id", Seq("text"))
      .groupBy("status").count().as[(String, Long)].collect().toMap
    val feed = Merge.changeSet(old, cur, "doc_id")
    assert(feed.count() ==
      byStatus.getOrElse("added", 0L) + byStatus.getOrElse("changed", 0L) +
        byStatus.getOrElse("removed", 0L))
    assert(feed.filter($"_op" === "delete").count() ==
      byStatus.getOrElse("removed", 0L))
  }

  test("gated merge_upsert matches the direct union-anti-join form") {
    val direct = {
      val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
      val t = docs.filter($"doc_id" % 7 =!= 2)
      val u = docs.filter($"doc_id" % 3 === 0)
        .withColumn("text", concat($"text", lit(" [patched]")))
      u.unionByName(t.join(u.select("doc_id"), Seq("doc_id"), "left_anti"))
    }
    assert(Merge.mergeUpsert(spark, sf)
      .as[(Long, String, String)].collect().sorted.toSeq ==
      direct.as[(Long, String, String)].collect().sorted.toSeq)
  }

  test("randomized round-trip law: applyChanges(old, changeSet(old, cur)) " +
    "== cur over 20 random keyed-table pairs", graft.Slow) {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { trial =>
      // random keyed tables with overlapping key ranges, random nulls
      def table(): DataFrame = {
        val n = 1 + rnd.nextInt(40)
        (1 to n).map { _ =>
          val k = rnd.nextInt(30).toLong
          val v = if (rnd.nextInt(5) == 0) null
                  else rnd.alphanumeric.take(3).mkString
          (k, v)
        }.distinct.groupBy(_._1).map(_._2.head).toSeq // unique keys
          .toDF("k", "v")
      }
      val old = table(); val cur = table()
      val byHash = trial % 2 == 0
      val got = Merge.applyChanges(old,
          Merge.changeSet(old, cur, "k", byHash = byHash), "k")
        .as[(Long, Option[String])].collect().sorted.toSeq
      val want = cur.as[(Long, Option[String])].collect().sorted.toSeq
      assert(got == want, s"trial $trial (byHash=$byHash) diverged")
    }
  }

  test("plan shape: upsert is one anti-join + union, no cartesian") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val plan = Merge.upsert(docs, docs.limit(10), "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
  }
}
