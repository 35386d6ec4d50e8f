package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AnnSearchSpec extends SparkSpec {
  test("ANN candidates prune the corpus yet keep usable top-5 recall") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
    val queries = vecs.filter(col("vec_id") % 10 === 0)
    val n = vecs.count()

    val ann = AnnSearch.annTopK(vecs, queries, "vec_id", dims = 64, k = 5).cache()

    // exact top-5 ground truth (brute force at this tiny SF)
    val withNorm = vecs.withColumn("nrm",
      sqrt(expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a,v) -> a+v)")))
    val q = withNorm.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"), col("nrm").as("nq"))
    val c = withNorm
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ec"), col("nrm").as("nc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    val exact = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        expr("aggregate(zip_with(eq, ec, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (a,v) -> a+v)")
          / (col("nq") * col("nc")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("query_id", "neighbor_id")

    val nQ = queries.count()
    val hits = exact.join(ann.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / (nQ * 5)
    // random 64-d data is near-orthogonal (hardest case); the point of the
    // spec is the mechanism: meaningful recall with far fewer comparisons
    assert(recall >= 0.4, s"recall@5 was $recall")

    // candidates actually compared:
    val cands = AnnSearch.sketchCells(vecs, "vec_id", 64, 6, 4)
      .groupBy("table_idx", "bucket").count()
      .agg(sum(col("count") * col("count"))).first().getLong(0)
    assert(cands < n * n / 2, s"bucketed comparisons $cands must prune ${n * n}")
  }

  test("sketch codegen survives the r11 pathological sizing (24x15x64) " +
    "without the 64 KB whole-stage fallback; buckets pinned to the " +
    "plane convention") {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{LogEvent, Logger => CoreLogger}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    val dims = 64; val tables = 24; val planes = 15
    // all-ones vector: each plane's dot is an exact small integer
    // (#pos - #neg signs), so the float/double sign agrees exactly and
    // the expected buckets are reproducible driver-side
    import spark.implicits._
    val v = Seq.fill(dims)(1.0f)
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    // replicate the plane convention (pins it: a silent change to the
    // seeded-sign rule would re-bucket every stored sketch)
    def sign(t: Int, p: Int, i: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$t:$p:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2 == 0) 1
      else -1
    }
    val want = (0 until tables).map { t =>
      (t, (0 until planes).map { p =>
        val dot = (0 until dims).map(i => sign(t, p, i)).sum
        if (dot > 0) 1L << p else 0L
      }.sum)
    }.toMap
    val captured = collection.mutable.ArrayBuffer.empty[String]
    val appender = new AbstractAppender("graft-codegen-capture", null,
        null, false, org.apache.logging.log4j.core.config.Property
          .EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        captured.synchronized {
          captured += e.getMessage.getFormattedMessage }
    }
    appender.start()
    val root = LogManager.getRootLogger.asInstanceOf[CoreLogger]
    root.addAppender(appender)
    val got =
      try AnnSearch.sketchCells(df, "vec_id", dims, tables, planes)
        .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
      finally { root.removeAppender(appender); appender.stop() }
    assert(got == want, s"bucket convention moved: ${got.toSeq.sorted}")
    val fallback = captured.filter(m =>
      m.contains("grows beyond 64 KB") ||
        m.contains("too long generated codes") ||
        m.contains("hugeMethodLimit") ||
        m.contains("Whole-stage codegen disabled"))
    assert(fallback.isEmpty, fallback.mkString("\n"))
  }
}
