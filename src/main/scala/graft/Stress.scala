package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness: multiplies the sf0.1 tables N× on disk (ids
  * remapped so keys stay unique) and runs the headline operators —
  * evidence that plans hold past the oracle SF, not just at it.
  *
  * `SPARK_GRAFT_STRESS_MULT` (default 20) → ~12M lineitem rows,
  * 2M events, 100k docs at 20×. Run:
  *   SPARK_GRAFT_STRESS_MULT=20 sbt "runMain graft.Stress"
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "20").toInt
    val src = "/root/testdata/sf0.1"
    val dir = s"/tmp/graft-stress-x$mult"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def blowUp(name: String, idCols: Seq[String], shift: Long): Unit = {
      val out = s"$dir/$name.parquet"
      if (!new java.io.File(out).exists()) {
        // route through the typed loader so events' nanos ts converts
        val base = if (name == "events") Tables.events(spark, src)
                   else Tables.load(spark, src, name)
        val copies = spark.range(mult).withColumnRenamed("id", "_copy")
        val big = idCols.foldLeft(base.crossJoin(copies))(
          (df, c) => df.withColumn(c, col(c) + col("_copy") * shift))
          .drop("_copy")
        big.write.mode("overwrite").parquet(out)
      }
    }
    // key shift keeps ids disjoint between copies; FK pairs shift together
    blowUp("lineitem", Seq("l_orderkey"), 10000000L)
    blowUp("orders", Seq("o_orderkey"), 10000000L)
    blowUp("customer", Seq("c_custkey"), 0L)        // dims stay as-is (×mult rows is fine)
    blowUp("nation", Seq(), 0L)
    blowUp("region", Seq(), 0L)
    blowUp("supplier", Seq(), 0L)
    blowUp("part", Seq(), 0L)
    blowUp("events", Seq("event_id"), 10000000L)    // same users, mult× events each
    blowUp("documents", Seq("doc_id"), 10000000L)
    blowUp("embeddings", Seq("vec_id"), 10000000L)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STRESS $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    // warm
    Tables.lineitem(spark, dir).count()

    time("q1_pricing")(CoreQueries.q1Pricing(spark, dir).count())
    time("q6_filter_agg")(CoreQueries.q6FilterAgg(spark, dir).count())
    time("q3_topk")(CoreQueries.q3TopK(spark, dir).count())
    time("feat_customer_stats")(CoreQueries.featCustomerStats(spark, dir).count())
    time("feat_sessionize")(FeatureOps.featSessionize(spark, dir).count())
    time("feat_rolling_agg")(FeatureOps.featRollingAgg(spark, dir).count())
    time("feat_pit_join")(FeatureOps.featPitJoin(spark, dir).count())
    time("dedup_exact")(Dedup.dedupExact(spark, dir).count())
    time("text_quality")(TextOps.textQuality(spark, dir).count())
    time("dedup_minhash")(Dedup.dedupMinhash(spark, dir).count())

    // scalable dedup pipeline in the standard order: exact dedup FIRST
    // (this corpus is 95% exact copies — as web crawls are), then
    // near-dup over the surviving representatives only. Running near-dup
    // before exact dedup would pay quadratic pair cost inside every
    // duplicate cluster for pairs exact dedup removes for free.
    time("ngram_scalable_pairs") {
      val docs = Tables.documents(spark, dir)
      val reps = docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .join(docs, Seq("doc_id"))
      val sh = reps
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
      NgramDedup.scalablePairs(sh, "doc_id", 0.8, maxDf = 40).count()
    }
    // cluster consolidation over the scalable near-dup pairs: the
    // pairs→components→representatives tail of the dedup pipeline
    time("dedup_clusters_cc") {
      val docs = Tables.documents(spark, dir)
      val reps = docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .join(docs, Seq("doc_id"))
      val sh = reps
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
      val pairs = NgramDedup.scalablePairs(sh, "doc_id", 0.8, maxDf = 40)
      DedupClusters.connectedComponents(pairs, "id_a", "id_b").count()
    }
    time("ann_topk_lsh") {
      val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      AnnSearch.annTopK(vecs, vecs.filter(col("vec_id") % 1000 === 0),
        "vec_id", dims = 64, k = 5).count()
    }
    time("mm_batched_decode") {
      val media = graft.multimodal.MultimodalPipeline.asMediaTable(
        Tables.documents(spark, dir))
      graft.multimodal.MultimodalPipeline.decodeAudio(media).count() +
        graft.multimodal.MultimodalPipeline.decodeVideo(media).count()
    }
    time("ivf_topk") {
      val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      IvfSearch.ivfTopK(vecs, vecs.filter(col("vec_id") % 1000 === 0),
        "vec_id", k = 5).count()
    }
    spark.stop()
  }
}
