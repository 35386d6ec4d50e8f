package graft

import graft.registry._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end walkthrough of the feature-store surface — the
  * reference service's workflow (register raw table → define features →
  * materialize versions → serve vectors; reference main.py) driven
  * through the public API, including the durability path: the second
  * FeatureStore instance proves the `_versions` manifest replays.
  *
  * Usage: sbt "runMain graft.FeatureStoreDemo [sfDir] [storeDir] [nBuckets]"
  * A third argument enables the bucketed store layout (shuffle-free
  * serving plans — the cluster-scale configuration).
  */
object FeatureStoreDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val storeDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString + "/values")
    val buckets = args.lift(2).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fs = new FeatureStore(spark, storeDir, bucketEntities = buckets)
    fs.registerTable(TableDef("orders",
      Seq("o_custkey", "o_totalprice", "o_orderstatus"),
      Map("o_totalprice" -> "numeric", "o_orderstatus" -> "string")),
      Tables.orders(spark, sfDir)) match {
      case Right(t) => println(s"registered table: ${t.name}")
      case Left(errs) => sys.error(errs.mkString("; "))
    }
    fs.defineFeature(FeatureDef("total_spend", "orders", "numeric",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(sum("o_totalprice").as("value"))))
    fs.defineFeature(FeatureDef("last_status", "orders", "categorical",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(max("o_orderstatus").as("value"))))

    println(fs.computeVersion("total_spend", "v1.0", Map("job" -> "demo")))
    println(fs.computeVersion("last_status", "v1.0"))
    println(fs.computeVersion("total_spend", "v1.1"))
    fs.archive("total_spend", "v1.0")
    println(s"purged: ${fs.purgeArchived()}")

    val vecs = fs.featureVectors()
    println(s"vector schema: ${vecs.schema.simpleString}")
    buckets.foreach { _ =>
      val shuffles = vecs.queryExecution.executedPlan.toString
        .split("\n").count(_.contains("Exchange hashpartitioning"))
      println(s"bucketed serving plan shuffle exchanges: $shuffles")
    }
    vecs.orderBy("entity_id").show(5, truncate = false)

    val ids = vecs.select("entity_id").orderBy("entity_id").limit(3)
      .collect().map(_.getString(0)).toSeq
    println(s"prefetched: ${fs.prefetchVectors(ids)} vectors")
    ids.foreach(id => println(s"serve $id -> ${fs.getVector(id)}"))
    println(s"cache hits=${fs.cacheHits} misses=${fs.cacheMisses}")

    // durability: a brand-new instance over the same path, nothing re-registered
    val fs2 = new FeatureStore(spark, storeDir, bucketEntities = buckets)
    println(s"restarted versions: ${fs2.listVersions("total_spend")}")
    println(s"restarted serve ${ids.head} -> ${fs2.getVector(ids.head)}")

    // pre-materialization quality gate: route dirty rows out, keep them inspectable
    val (clean, dirty) = Expectations.quarantine(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice", "o_orderstatus"),
      Seq(Expectations.InRange("o_totalprice", 0, 300000),
        Expectations.OneOf("o_orderstatus", Seq("O", "F"))))
    println(s"quarantine: clean=${clean.count()} dirty=${dirty.count()}")
    dirty.orderBy("o_orderkey").show(3, truncate = false)
    spark.stop()
  }
}
