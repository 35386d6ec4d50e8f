package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntegrityOpsSpec extends SparkSpec {
  import spark.implicits._

  private val child = Seq(
    (Some(1L), "a"), (Some(1L), "b"), (Some(2L), "c"),
    (Some(9L), "d"), (Some(9L), "e"), (Some(8L), "f"),
    (None, "g"))
    .toDF("fk", "payload")
  private val parent = Seq(1L, 2L, 3L).toDF("pk")

  test("fkAudit counts orphan rows, orphan keys, and nulls with SQL FK semantics") {
    val r = IntegrityOps.fkAudit("t", child, "fk", parent, "pk").collect().head
    assert(r.getString(0) === "t")
    assert(r.getLong(1) === 6L) // non-null child rows
    assert(r.getLong(2) === 1L) // null key satisfies the constraint
    assert(r.getLong(3) === 3L) // rows with fk in {9,9,8}
    assert(r.getLong(4) === 2L) // distinct orphan keys {9,8}
  }

  test("clean relation is all-zero and duplicate parent keys don't double-count") {
    val dupParent = Seq(1L, 1L, 2L, 3L, 3L).toDF("pk")
    val clean = child.filter(col("fk").isin(1L, 2L) || col("fk").isNull)
    val r = IntegrityOps.fkAudit("t", clean, "fk", dupParent, "pk").collect().head
    assert((r.getLong(3), r.getLong(4)) === ((0L, 0L)))
  }

  test("orphans returns exactly the violating rows, nulls excluded") {
    val got = IntegrityOps.orphans(child, "fk", parent, "pk")
      .select("payload").collect().map(_.getString(0)).toSet
    assert(got === Set("d", "e", "f"))
  }

  test("fkAuditAll unions relation verdicts; empty declaration refuses") {
    val two = IntegrityOps.fkAuditAll(Seq(
      ("r1", child, "fk", parent, "pk"),
      ("r2", parent, "pk", child.filter(col("fk").isNotNull), "fk")))
    assert(two.count() === 2)
    intercept[IllegalArgumentException] { IntegrityOps.fkAuditAll(Nil) }
  }

  test("gate: clean lane all-zero, planted lane matches the modulus arithmetic") {
    val rows = IntegrityOps.fkAuditGate(spark, sf).collect()
    val byRel = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val clean = byRel("lineitem.orderkey->orders")
    assert(clean._3 === 0L && clean._4 === 0L)
    val orders = graft.Tables.orders(spark, sf)
    val planted = orders.filter(col("o_orderkey") % 97 === 0).count()
    val nulled = orders.filter(col("o_orderkey") % 101 === 0 &&
      col("o_orderkey") % 97 =!= 0).count()
    val dirty = byRel("orders_dirty.custkey->customer")
    assert(dirty._2 === nulled)
    assert(dirty._3 === planted)
    assert(dirty._1 === orders.count() - nulled)
  }

  test("plan: existence probe joins key counts, parent side broadcast") {
    val plan = IntegrityOps.fkAuditGate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"parent keys not broadcast:\n$plan")
  }
}
