package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {
  test("salted aggregation matches direct groupBy exactly (counts)") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val salted = SkewOps.saltedCountSum(ev, "user_id", "value", salts = 8)
      .select("user_id", "n")
    assert(direct.except(salted).count() === 0)
    assert(salted.except(direct).count() === 0)
  }

  test("profileKey: exact top-k, pinned tie rank, concentration totals") {
    import spark.implicits._
    // 'hot' 6×, 'b' and 'a' tied at 2 (string tie -> 'a' ranks first),
    // 'z' once: 11 rows over 4 keys, mean 2.75, max_over_mean 6/2.75
    val df = (Seq.fill(6)("hot") ++ Seq.fill(2)("b") ++ Seq.fill(2)("a") ++
      Seq("z")).toDF("k")
    val p = SkewOps.profileKey(df, "k", topK = 3)
      .collect().map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("key_n"), r.getAs[Int]("rank"),
          r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
          r.getAs[Double]("max_over_mean"))).toMap
    assert(p.keySet === Set("hot", "a", "b"), "z falls outside top-3")
    assert(p("hot")._2 === 1 && p("a")._2 === 2 && p("b")._2 === 3,
      s"tie ranks by ascending key string: $p")
    assert(p("hot")._1 === 6L)
    p.values.foreach { case (_, _, rows, keys, mom) =>
      assert(rows === 11L && keys === 4L)
      assert(math.abs(mom - 6.0 / 2.75) < 1e-15)
    }
    // a smaller-than-k key space returns every key
    assert(SkewOps.profileKey(df, "k", topK = 100).count() === 4)
    intercept[IllegalArgumentException] { SkewOps.profileKey(df, "k", 0) }
  }

  test("salted sum matches direct within fp tolerance") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy(col("user_id")).agg(sum(col("value")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = SkewOps.saltedCountSum(ev, "user_id", "value", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(direct.keySet === salted.keySet)
    direct.foreach { case (k, v) =>
      assert(math.abs(v - salted(k)) < 1e-6 * math.max(1.0, math.abs(v)))
    }
  }
}
