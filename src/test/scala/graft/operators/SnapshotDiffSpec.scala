package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** G24 snapshot diff: the status rule (incl. null-safe comparison),
  * duplicate-key guard, hash-mode equivalence, churn summary. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("statuses: added/removed/changed/unchanged with null-safe comparison") {
    val old = Seq(
      (1L, Some("a"), Some(10)), // unchanged
      (2L, Some("b"), Some(20)), // changed (value)
      (3L, None, Some(30)),      // unchanged (null == null on text)
      (4L, Some("d"), None),     // changed (null -> value transition)
      (5L, Some("e"), Some(50))  // removed
    ).toDF("id", "text", "v")
    val cur = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("b"), Some(21)),
      (3L, None, Some(30)),
      (4L, Some("d"), Some(40)),
      (6L, Some("f"), Some(60))  // added
    ).toDF("id", "text", "v")
    val d = SnapshotDiff.diff(old, cur, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "changed", 5L -> "removed", 6L -> "added"))

    // restricting compare columns changes the verdict: on text alone,
    // rows 2 and 4 are unchanged
    val dt = SnapshotDiff.diff(old, cur, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dt(2L) === "unchanged" && dt(4L) === "unchanged")
  }

  test("duplicate keys fail loudly instead of fabricating diff rows") {
    val old = Seq((1L, "a"), (1L, "b")).toDF("id", "text")
    val cur = Seq((1L, "a")).toDF("id", "text")
    val e = intercept[Exception] {
      SnapshotDiff.diff(old, cur, "id").collect() }
    assert(e.getMessage.contains("duplicate key") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate key")))
  }

  test("hash mode flags the identical set on the real corpus") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val old = docs.filter(col("doc_id") % 7 =!= 2)
    val cur = docs.filter(col("doc_id") % 7 =!= 1)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
    val exact = SnapshotDiff.diff(old, cur, "doc_id")
    val hashed = SnapshotDiff.diff(old, cur, "doc_id", byHash = true)
    assert(exact.except(hashed).count() === 0 &&
      hashed.except(exact).count() === 0)
    // every status occurs in this construction
    val statuses = exact.select("status").distinct()
      .collect().map(_.getString(0)).toSet
    assert(statuses === Set("added", "removed", "changed", "unchanged"))
  }

  test("plan shape: the full-outer join reuses the side aggregates' partitioning") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val cur = docs.filter(col("doc_id") % 2 === 0)
    val d = SnapshotDiff.diff(docs, cur, "doc_id")
    d.write.format("noop").mode("overwrite").save()
    val plan = d.queryExecution.executedPlan.toString
    // one hash exchange per side, zero for the join — the provable
    // minimum plus the dup guard (scaladoc claim, pinned here)
    val n = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
    assert(n === 2, s"expected exactly 2 exchanges, saw $n:\n$plan")
  }

  test("diffSummary: counts per status and the churn fraction over cur") {
    val d = Seq((1L, "unchanged"), (2L, "unchanged"), (3L, "changed"),
      (4L, "added"), (5L, "removed")).toDF("id", "status")
    val s = SnapshotDiff.diffSummary(d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // |cur| = unchanged + changed + added = 4; churn = changed + added = 2
    assert(s.keySet === Set("unchanged", "changed", "added", "removed"))
    assert(s("unchanged")._1 === 2L && s("removed")._1 === 1L)
    s.values.foreach { case (_, churn) => assert(churn === 0.5) }
  }
}
