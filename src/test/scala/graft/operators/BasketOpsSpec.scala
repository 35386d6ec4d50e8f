package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B29 market-basket: exact pair supports, lift arithmetic, duplicate
  * incidence collapse, the support filter, canonical item_a < item_b,
  * and the loud basket-size cap. */
class BasketOpsSpec extends SparkSpec {
  import spark.implicits._

  // baskets: 1:{A,B,C}, 2:{A,B}, 3:{A,C}, 4:{D} ; basket 2 lists A
  // twice (a quantity re-order) — incidence must collapse it
  private def fixture = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "C"),
    (4L, "D")
  ).toDF("basket", "item")

  test("pair supports and lift are exact; duplicates collapse; " +
    "support filter drops singles; item_a < item_b canonical") {
    val out = BasketOps.copurchasePairs(fixture, "basket", "item",
      minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // AB in baskets 1,2; AC in 1,3; BC only in 1 (dropped at support 2)
    assert(out.keySet === Set(("A", "B"), ("A", "C")))
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("n_pair") === 2L)
    assert(ab.getAs[Long]("n_a") === 3L) // A in baskets 1,2,3
    assert(ab.getAs[Long]("n_b") === 2L) // B in baskets 1,2
    // lift = n_ab * N / (n_a * n_b) = 2*4 / (3*2)
    assert(ab.getAs[Double]("lift") === 8.0 / 6.0)
    assert(out(("A", "C")).getAs[Double]("lift") === 8.0 / 6.0)
  }

  test("minSupport 1 keeps every co-occurring pair; lone items never " +
    "pair") {
    val all = BasketOps.copurchasePairs(fixture, "basket", "item", 1)
      .select("item_a", "item_b").as[(String, String)].collect().toSet
    assert(all === Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(!all.exists(p => p._1 == "D" || p._2 == "D"))
  }

  test("basket past maxBasket fails loudly on the basket's own flow") {
    val err = intercept[Exception] {
      BasketOps.copurchasePairs(fixture, "basket", "item", 1,
        maxBasket = 2).collect()
    }
    assert(err.getMessage.contains("maxBasket") ||
      Option(err.getCause).exists(_.getMessage.contains("maxBasket")))
    intercept[IllegalArgumentException] {
      BasketOps.copurchasePairs(fixture, "basket", "item", 0) }
  }

  test("gate runs on the real lineitem: every pair meets support, " +
    "canonical order, lift positive and finite") {
    val g = BasketOps.copurchaseGate(spark, sf)
    val rows = g.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pair") >= 2L)
      assert(r.getAs[Long]("item_a") < r.getAs[Long]("item_b"))
      val lift = r.getAs[Double]("lift")
      assert(lift > 0.0 && !lift.isInfinite && !lift.isNaN)
    }
  }

  test("plan: the pairs join keys on the basket column (never " +
    "cartesian); the only crossJoin input is the 1-row N frame") {
    val plan = BasketOps.copurchasePairs(fixture, "basket", "item", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
