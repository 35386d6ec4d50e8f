package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Per-group quantile bucketing must place every row exactly where the
  * percentile_disc cut arithmetic says (ties LOW), route null values to
  * a null bucket, survive skewed groups without a per-group window, and
  * compose with the LM scorer into the CCNet head/middle/tail split.
  */
class PerplexityBucketsSpec extends SparkSpec {
  import spark.implicits._

  /** percentile_disc per the PercentileOps contract: smallest value
    * whose cumulative count reaches the smallest k with k/n >= p. */
  private def refCuts(values: Seq[Double], nBuckets: Int): Seq[Double] = {
    val sorted = values.sorted
    val n = sorted.length
    (1 until nBuckets).map { b =>
      val p = b.toDouble / nBuckets
      var k = math.max(1, math.min(n, math.ceil(p * n).toInt))
      while (k > 1 && (k - 1).toDouble / n >= p) k -= 1
      while (k.toDouble / n < p && k < n) k += 1
      sorted(k - 1)
    }
  }

  private def refBucket(v: Double, cuts: Seq[Double]): Int =
    cuts.count(c => v > c)

  test("constructed: exact cut arithmetic with ties going low") {
    val d = (1 to 9).map(i => (i.toLong, "g", i.toDouble))
      .toDF("doc_id", "lang", "ppl")
    val got = PerplexityBuckets.assignBuckets(d, nBuckets = 3)
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    // cuts: p=1/3 -> k=3 -> 3.0; p=2/3 -> k=6 -> 6.0
    (1 to 3).foreach(i => assert(got(i.toLong) === 0, s"v=$i"))
    (4 to 6).foreach(i => assert(got(i.toLong) === 1, s"v=$i"))
    (7 to 9).foreach(i => assert(got(i.toLong) === 2, s"v=$i"))
  }

  test("per-group cuts are independent; nulls bucket to null; names attach") {
    val d = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 100.0), (5L, "b", 200.0), (6L, "b", 300.0),
      (7L, "a", Double.NaN)
    ).toDF("doc_id", "lang", "ppl")
      .union(Seq((8L, "a", null.asInstanceOf[java.lang.Double]))
        .toDF("doc_id", "lang", "ppl"))
    val got = PerplexityBuckets.headMiddleTail(d)
      .select(col("doc_id"), col("bucket"), col("bucket_name"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getInt(1))),
          Option(r.getString(2)))).toMap
    // group b's small values land in b's own head, not a's tail
    assert(got(4L) === ((Some(0), Some("head"))))
    assert(got(6L) === ((Some(2), Some("tail"))))
    assert(got(7L)._1 === None, "NaN must not inherit a tier")
    assert(got(8L)._1 === None, "null must not inherit a tier")
  }

  test("real-table parity with the single-node reference, skewed groups, no window") {
    // n_tokens as the value; lang is the group — the real table's lang
    // distribution is uneven, which is the operator's design case
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("double").as("ppl"))
      .cache()
    val out = PerplexityBuckets.assignBuckets(d, nBuckets = 4)
    val got = out.select("doc_id", "lang", "ppl", "bucket")
      .as[(Long, String, Double, Int)].collect()
    val byLang = got.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val cuts = refCuts(rows.map(_._3).toSeq, 4)
      rows.foreach { case (id, _, v, b) =>
        assert(b === refBucket(v, cuts), s"doc $id lang $lang v=$v")
      }
      // every group uses its own cuts: each bucket non-empty per group
      assert(rows.map(_._4).distinct.size === 4, s"lang $lang buckets")
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no per-group window allowed:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"cuts must join broadcast:\n$plan")
  }

  test("composes with the LM scorer into head/middle/tail (the CCNet shape)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val model = NgramLm.train(docs, order = 2).localCheckpoint(true)
    val scored = NgramLm.score(docs, model)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val buckets = PerplexityBuckets.headMiddleTail(scored)
    val counts = buckets.groupBy("lang", "bucket_name").count()
      .as[(String, String, Long)].collect()
    val langs = counts.map(_._1).distinct
    langs.foreach { l =>
      val per = counts.filter(_._1 == l).map(c => c._2 -> c._3).toMap
      assert(per.keySet === Set("head", "middle", "tail"), s"lang $l: $per")
      // thirds within one of each other (exact order statistics)
      val vals = per.values.toSeq
      assert(vals.max - vals.min <= 2, s"lang $l unbalanced: $per")
    }
  }

  test("guards") {
    val d = Seq((1L, "a", 1.0)).toDF("doc_id", "lang", "ppl")
    intercept[IllegalArgumentException] {
      PerplexityBuckets.assignBuckets(d, nBuckets = 1)
    }
    intercept[IllegalArgumentException] {
      PerplexityBuckets.assignBuckets(d, names = Seq("one"))
    }
  }
}
