package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ChunkOps semantics, each checked two ways: against a local Scala
  * recompute of the contract (chunk coverage/overlap, shard fill,
  * centroid sums) on the real tables, and — for shardPack — against the
  * single-partition global-window form its distributed prefix sum
  * replaces (must be bit-identical). */
class ChunkOpsSpec extends SparkSpec {
  import spark.implicits._

  private def localToks(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("textChunk covers every token with the declared window/stride") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.flatMap { case (id, text) =>
      val t = localToks(text)
      if (t.isEmpty) Seq.empty
      else {
        val w = 32; val s = 24
        val nChunks = 1 + (math.max(t.length - w, 0) + s - 1) / s
        (0 until nChunks).map { i =>
          val chunk = t.slice(i * s, math.min(i * s + w, t.length))
          (id, i.toLong, chunk.length.toLong, md5Hex(chunk.mkString(" ")))
        }
      }
    }.toSet
    val got = ChunkOps.textChunk(spark, sf)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === expected)
    // every multi-chunk doc overlaps its neighbor by exactly w - s tokens
    val multi = expected.groupBy(_._1).filter(_._2.size > 1)
    assert(multi.nonEmpty, "fixture must exercise multi-chunk docs")
    // and tail chunks are allowed to be short but never empty
    assert(expected.forall { case (_, _, n, _) => n > 0 && n <= 32 })
  }

  test("shardPack is bit-identical to the global-window form") {
    val perDoc = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), t => t =!= lit("")))
          .cast("long").as("n_tok"))
    val globalWindow = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = perDoc
      .withColumn("_cumw", sum(col("n_tok")).over(globalWindow))
      .withColumn("shard_id", expr("coalesce(_cumw, 0L) div 512"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val got = ChunkOps.shardPack(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === naive)
    // shards are contiguous doc ranges: sorted by shard, last_doc + 1 ==
    // next shard's first_doc
    val sorted = got.toSeq.sortBy(_._1)
    assert(sorted.map(_._1) === sorted.indices.map(_.toLong))
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._5 + 1 === b._4)
      case _ =>
    }
  }

  test("embCentroid matches a local exact recompute") {
    val vecs = Tables.embeddings(spark, sf)
      .select("label", "embedding").as[(Int, Array[Float])].collect()
    val expected = vecs.flatMap { case (label, emb) =>
      emb.zipWithIndex.map { case (v, i) =>
        ((label, (i + 1).toLong), math.floor(v.toDouble * 1e7 + 0.5).toLong)
      }
    }.groupBy(_._1).map { case (k, xs) => (k, (xs.map(_._2).sum, xs.size.toLong)) }
    val got = ChunkOps.embCentroid(spark, sf)
      .as[(Int, Long, Long, Long)].collect()
      .map { case (l, p, s, n) => ((l, p), (s, n)) }.toMap
    assert(got === expected)
  }

  test("exclusivePrefixSum is bit-identical to the global-window sum") {
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long").as("v"))
    val expected = df
      .withColumn("cum", coalesce(sum(col("v")).over(
        Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    val got = RankOps.exclusivePrefixSum(df, "v", "cum", 3, col("doc_id"))
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }
}
