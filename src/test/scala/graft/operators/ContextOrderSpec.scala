package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ContextOrderSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated topic blobs in 4-d plus a deterministic jitter;
  // ids interleave the topics so input order carries no signal
  private def blobs(n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val topic = i % 2
      val base = if (topic == 0) Array(1f, 0f, 0f, 0f)
                 else Array(0f, 0f, 1f, 0f)
      val j1 = ((i * 2654435761L) % 100).toFloat / 1000f
      val j2 = ((i * 40503L) % 100).toFloat / 1000f
      (i.toLong, Array(base(0) + j1, base(1) + j2, base(2) + j1,
        base(3) + j2).toSeq)
    }
    rows.toDF("id", "embedding")
  }

  private def cents: DataFrame = Seq(
    (0, Seq(1f, 0.05f, 0.05f, 0.05f)),
    (1, Seq(0.05f, 0.05f, 1f, 0.05f))).toDF("list_id", "centroid")

  test("output is a permutation with globally monotone ctx_order") {
    val df = blobs(40)
    val out = ContextOrder.orderWithCentroids(df, cents)
    assert(out.count() == 40)
    assert(out.select("id").distinct().count() == 40)
    // ctx_order strictly increases along (cluster_rank, ctx_pos)
    val seq = out.orderBy("cluster_rank", "ctx_pos")
      .select("ctx_order").as[Long].collect().toSeq
    assert(seq == seq.sorted && seq.distinct.size == seq.size)
  }

  test("topic blobs occupy contiguous ctx_order blocks") {
    val out = ContextOrder.orderWithCentroids(blobs(40), cents)
      .orderBy("ctx_order")
      .select("id").as[Long].collect().toSeq
    val topics = out.map(_ % 2)
    // all of one topic, then all of the other — exactly one transition
    val transitions = topics.sliding(2).count(p => p.head != p.last)
    assert(transitions == 1, s"expected 2 contiguous blocks, got $topics")
  }

  test("adjacent-pair similarity beats the input (id) order") {
    val df = blobs(60)
    val emb = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    def meanAdj(ids: Seq[Long]): Double =
      ids.sliding(2).map(p => cos(emb(p.head), emb(p.last))).toSeq.sum /
        (ids.size - 1)
    val ordered = ContextOrder.orderWithCentroids(df, cents)
      .orderBy("ctx_order").select("id").as[Long].collect().toSeq
    val byId = ordered.sorted
    assert(meanAdj(ordered) > meanAdj(byId) + 0.1,
      s"${meanAdj(ordered)} vs ${meanAdj(byId)}")
  }

  test("deterministic across runs and layouts") {
    val df = blobs(50)
    val a = ContextOrder.orderWithCentroids(df, cents)
      .orderBy("ctx_order").collect().toSeq
    val b = ContextOrder.orderWithCentroids(df.repartition(7), cents)
      .orderBy("ctx_order").collect().toSeq
    assert(a == b)
  }

  test("oversized cluster fails loudly with the nlist remedy") {
    val df = blobs(40)
    val ex = intercept[Exception] {
      ContextOrder.orderWithCentroids(df, cents, maxClusterSize = 10)
        .collect()
    }
    assert(ex.getMessage.contains("maxClusterSize") ||
      ex.getCause != null &&
        ex.getCause.getMessage.contains("maxClusterSize"))
  }

  test("null embedding fails loudly at the seam, not as a UDF NPE") {
    val df = blobs(10).unionByName(
      Seq((99L, null.asInstanceOf[Seq[Float]])).toDF("id", "embedding"))
    val ex = intercept[Exception] {
      ContextOrder.orderWithCentroids(df, cents).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("null embedding")), msgs(ex).toString)
  }

  test("composition: pack on ctx_order puts topic-mates in the same " +
    "sequences") {
    val df = blobs(40)
    val ord = ContextOrder.orderWithCentroids(df, cents)
    // payload = [id+100, id+1000] (offset clear of eodId=1/padId=0);
    // 3 ids per doc with eod, seqLen 12 -> 4 docs per sequence
    val encoded = df.select(col("id"),
        array(col("id") + 100L, col("id") + 1000L).as("ids"))
      .join(ord.select("id", "ctx_order"), Seq("id"))
    val packed = PackWhole.packSequencesWhole(
      encoded.select(col("ctx_order"), col("ids")),
      seqLen = 12, idCol = "ctx_order")
    // reconstruct each sequence's doc ids from the payload marker
    // tokens and check topic purity: at most the single boundary
    // sequence between the two contiguous topic blocks may mix
    val bySeq = packed.select(col("seq_id"), col("ids"))
      .as[(Long, Seq[Long])].collect()
    assert(bySeq.length > 2, "should produce several sequences")
    val mixedSeqs = bySeq.count { case (_, toks) =>
      toks.filter(t => t >= 100L && t < 140L).map(t => (t - 100) % 2)
        .distinct.size > 1
    }
    assert(mixedSeqs <= 1,
      s"at most the boundary sequence may mix topics, got $mixedSeqs")
  }

  test("trained-centroid path runs on the real embeddings table") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding"))
    val out = ContextOrder.order(vecs, nlist = 8)
    assert(out.count() == vecs.count())
    assert(out.select("id").distinct().count() == vecs.count())
    // composition: the ordering key sorts straight into a pack/export
    val packedOrder = out.orderBy("ctx_order").select("id")
      .as[Long].collect()
    assert(packedOrder.length == vecs.count().toInt)
  }
}
