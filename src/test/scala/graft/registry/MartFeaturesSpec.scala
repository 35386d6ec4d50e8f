package graft.registry

import graft.{SparkSpec, Tables, TrainingSet}
import graft.functions.Exact
import graft.operators.SupplyMart
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Directive: mart/snapshot → feature-store loop closure. A feature
  * registered off the maintained artifacts must be HASH-EQUAL to
  * computing it straight from the raw log (bit-identical doubles — the
  * finalize-last discipline), carry its point-in-time bound in the
  * version metadata, and ride TrainingSet.assemble like any feature. */
class MartFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): FeatureStore = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mf").toString
    new FeatureStore(spark, s"$dir/values")
  }
  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mf-$tag")
      .toString + "/state"

  private def vecOf(df: DataFrame, valueCol: String): Map[String, Double] =
    df.collect().map(r =>
      r.getAs[String]("entity_id") -> r.getAs[Double](valueCol)).toMap

  test("snapshot-derived spend feature: PIT-bounded, hash-equal to the raw-log compute, assembles") {
    val events = Tables.events(spark, sf)
    val snap = tmp("snap")
    assert(Incremental.refresh(spark, events, snap).touched > 0)
    // an as-of bound strictly inside the data: days past it exist in
    // the snapshot and must NOT contribute
    val days = events.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .distinct().orderBy("d").collect().map(_.getString(0))
    assert(days.length >= 3)
    val asOfDay = days(days.length / 2)

    val fs = freshStore()
    val v1 = MartFeatures.registerSnapshotSpend(fs, spark, snap,
      "user_spend", "v1", asOfDay)
    assert(v1.isRight, s"register failed: $v1")
    assert(v1.toOption.get.metadata("as_of_day") === asOfDay,
      "the PIT bound must be recorded on the version")

    // hash-equality: the raw-log twin, same finalize-last spelling
    val direct = vecOf(events
      .filter(date_format(col("ts"), "yyyy-MM-dd") <= asOfDay)
      .groupBy(col("user_id").cast("string").as("entity_id"))
      .agg((sum(Exact.cents(col("value"))).cast("double") / 100.0)
        .as("value")), "value")
    val served = vecOf(fs.featureVectors(Some(Seq("user_spend")),
      version = Some("v1")), "user_spend")
    assert(served === direct,
      "snapshot-derived feature diverged from the raw-log compute")
    // PIT: the bound really excluded the later days
    val unbounded = vecOf(events
      .groupBy(col("user_id").cast("string").as("entity_id"))
      .agg((sum(Exact.cents(col("value"))).cast("double") / 100.0)
        .as("value")), "value")
    assert(served !== unbounded, "as-of bound had no effect — days past it leaked")

    // a later version at a later bound must NOT disturb v1 (reproducible
    // training: the pinned version serves exactly what it declared)
    assert(fs.backfill("user_spend", "v2",
      slice = df => df.filter(col("day") <= days.last)).isRight)
    assert(vecOf(fs.featureVectors(Some(Seq("user_spend")),
      version = Some("v1")), "user_spend") === direct)

    // TrainingSet.assemble consumes it like any entity feature
    val labelUsers = direct.keys.take(3).toSeq
    val labelTs = java.sql.Timestamp.valueOf(s"$asOfDay 23:59:59")
    val labels = labelUsers.map(u => (u, labelTs, 1.0))
      .toDF("entity_id", "label_ts", "label")
    val evLong = events.select(col("user_id").cast("string").as("entity_id"),
      col("ts"), unix_micros(col("ts")).as("seq"), col("value"))
    val entities = fs.featureVectors(Some(Seq("user_spend")),
      version = Some("v1"))
    val assembled = TrainingSet.assemble(labels, evLong, entities).collect()
      .map(r => r.getAs[String]("entity_id") -> r).toMap
    assert(assembled.size === labelUsers.size)
    labelUsers.foreach { u =>
      assert(assembled(u).getAs[Double]("user_spend") === direct(u),
        s"assembled feature diverged for $u")
    }
  }

  test("re-registering an artifact feature at a different bound refuses, naming the backfill path") {
    val events = Tables.events(spark, sf)
    val snap = tmp("rereg")
    Incremental.refresh(spark, events, snap)
    val days = events.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .distinct().orderBy("d").collect().map(_.getString(0))
    val fs = freshStore()
    assert(MartFeatures.registerSnapshotSpend(fs, spark, snap,
      "user_spend", "v1", days.head).isRight)
    // the definition is immutable and carries v1's bound; a second
    // register at a different bound must refuse LOUDLY (silently
    // recording days.last in metadata while computing days.head would
    // be a wrong PIT bound) and point at the supported path
    val second = MartFeatures.registerSnapshotSpend(fs, spark, snap,
      "user_spend", "v2", days.last)
    assert(second.isLeft)
    assert(second.swap.toOption.get.exists(_.contains("backfill")),
      s"refusal must name the backfill path: $second")
  }

  test("mart-derived supplier value: hash-equal to the fact-log compute") {
    val li = Tables.lineitem(spark, sf)
    val mart = tmp("mart")
    assert(SupplyMart.refresh(spark, li, mart).touched > 0)
    val fs = freshStore()
    val v = MartFeatures.registerMartSupplierValue(fs, spark, mart,
      "supplier_value", "v1")
    assert(v.isRight, s"register failed: $v")
    assert(v.toOption.get.metadata("source") === "supply_mart")

    val direct = vecOf(li
      .groupBy(col("l_suppkey").cast("string").as("entity_id"))
      .agg((sum(Exact.cents(col("l_extendedprice"))).cast("double") / 100.0)
        .as("value")), "value")
    val served = vecOf(fs.featureVectors(Some(Seq("supplier_value"))),
      "supplier_value")
    assert(served === direct,
      "mart-derived feature diverged from the fact-log compute")
  }
}
