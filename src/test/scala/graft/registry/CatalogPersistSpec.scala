package graft.registry

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r18 directive 1 — the last reference-parity nuance: the reference's
  * registry survives restarts (definitions live in its database,
  * models.py:10-62, database.py:16-31, main.py:81-110); graft's was
  * process-local. saveDefs/loadDefs round-trips table defs and
  * SQL-defined feature defs through the knob-governed pointer protocol,
  * re-validated at load with the SAME registration-time plan analysis;
  * closure-defined features come back declared-but-unbound, loudly. */
class CatalogPersistSpec extends SparkSpec {

  private def dir() =
    java.nio.file.Files.createTempDirectory("graft-catalog").toString

  private val ordersDef = TableDef("orders", Seq("o_custkey", "o_totalprice"),
    Map("o_totalprice" -> "numeric"), Some("raw order facts"))
  private val custDef = TableDef("customer", Seq("c_custkey", "c_acctbal"))

  private def orders: DataFrame = Tables.orders(spark, sf)
  private def customer: DataFrame = Tables.customer(spark, sf)

  private val spendSql =
    """SELECT o_custkey AS entity_id,
      | CAST(SUM(floor(o_totalprice * 100 + 0.5)) AS DOUBLE)/100 AS value
      |FROM __THIS__ GROUP BY o_custkey""".stripMargin

  private def populate(store: FeatureStore): Unit = {
    assert(store.registerTable(ordersDef, orders).isRight)
    assert(store.registerTable(custDef, customer).isRight)
    assert(store.defineFeature(FeatureDef.sql("total_spend", "orders",
      "numeric", spendSql, Some("spend via SQL-as-data"))).isRight)
    assert(store.defineFeature(FeatureDef("order_status_mode", "orders",
      "categorical",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(max(col("o_orderstatus")).as("value")))).isRight)
    assert(store.computeVersion("total_spend", "v1").isRight)
    assert(store.computeVersion("order_status_mode", "v1").isRight)
  }

  private def binder(name: String): DataFrame = name match {
    case "orders" => orders
    case "customer" => customer
    case other => sys.error(s"unknown table $other")
  }

  test("register → save → new instance → load: defs, vectors, and the SQL path are byte-identical") {
    val root = dir()
    val s1 = new FeatureStore(spark, s"$root/values")
    populate(s1)
    s1.saveDefs()
    val probeEntity = orders.select(col("o_custkey").cast("string"))
      .head().getString(0)
    val v1 = s1.getVector(probeEntity)

    // "new session": a fresh store instance over the same path with
    // nothing registered — the restart shape
    val s2 = new FeatureStore(spark, s"$root/values")
    assert(s2.listTables.isEmpty && s2.listFeatures.isEmpty)
    val Right(report) = s2.loadDefs(binder): @unchecked
    assert(report.tables.sorted == Seq("customer", "orders"))
    assert(report.sqlFeatures == Seq("total_spend"))
    assert(report.unboundClosureFeatures == Seq("order_status_mode"))
    assert(s2.listTables.map(_.name) == s1.listTables.map(_.name))
    assert(s2.listTables == s1.listTables,
      "table defs must round-trip field-exact (requiredColumns, types, description)")
    assert(s2.listFeatures.map(f => (f.name, f.table, f.featureType, f.logic,
      f.description)) == s1.listFeatures.map(f => (f.name, f.table,
      f.featureType, f.logic, f.description)))

    // serving parity: the restored catalog serves the SAME vector
    assert(s2.getVector(probeEntity) == v1,
      "getVector after restart+load must be byte-identical")

    // the SQL-defined feature's COMPUTATION round-tripped: a version
    // computed by the restored def matches the original's rows exactly
    assert(s2.computeVersion("total_spend", "v2").isRight)
    val Right(a) = s2.versionValues("total_spend", "v1"): @unchecked
    val Right(b) = s2.versionValues("total_spend", "v2"): @unchecked
    val aRows = a.select("entity_id", "value").collect().map(_.toSeq).toSet
    val bRows = b.select("entity_id", "value").collect().map(_.toSeq).toSet
    assert(aRows == bRows, "restored SQL logic diverged from the original")
  }

  test("closure feature: loads declared-but-unbound, refuses computeVersion loudly, bindFeature revives it") {
    val root = dir()
    val s1 = new FeatureStore(spark, s"$root/values")
    populate(s1)
    s1.saveDefs()
    val s2 = new FeatureStore(spark, s"$root/values")
    assert(s2.loadDefs(binder).isRight)
    // stored versions still serve (the manifest, not the closure, backs them)
    val probeEntity = orders.select(col("o_custkey").cast("string"))
      .head().getString(0)
    assert(s2.getVector(probeEntity, Some(Seq("order_status_mode"))).nonEmpty)
    // but computing a NEW version refuses loudly with the remediation
    val e = intercept[IllegalStateException](
      s2.computeVersion("order_status_mode", "v2"))
    assert(e.getMessage.contains("bindFeature"))
    // re-binding code revives the verb
    assert(s2.bindFeature("order_status_mode",
      df => df.groupBy(col("o_custkey").as("entity_id"))
        .agg(max(col("o_orderstatus")).as("value"))).isRight)
    assert(s2.computeVersion("order_status_mode", "v2").isRight)
    // a SQL feature refuses bind — its computation is catalog data
    val Left(errs) = s2.bindFeature("total_spend", identity): @unchecked
    assert(errs.exists(_.contains("SQL-defined")))
  }

  test("load re-validates with the registration-time analysis: schema drift and bad SQL refuse AT LOAD, registry untouched") {
    val root = dir()
    val s1 = new FeatureStore(spark, s"$root/values")
    populate(s1)
    s1.saveDefs()

    // (a) the re-bound table lost the column the SQL needs → the plan
    // analysis refuses at load, and NOTHING is registered
    val s2 = new FeatureStore(spark, s"$root/values")
    val Left(errs) = s2.loadDefs {
      case "orders" => orders.drop("o_totalprice")
      case n => binder(n)
    }: @unchecked
    assert(errs.exists(e => e.contains("total_spend") || e.contains("o_totalprice")))
    assert(s2.listTables.isEmpty && s2.listFeatures.isEmpty,
      "a refused load must leave the registry untouched")

    // (b) a catalog whose stored SQL no longer parses (tampered /
    // hand-edited) refuses at load, not at serve
    val s3root = dir()
    val s3a = new FeatureStore(spark, s"$s3root/values")
    assert(s3a.registerTable(ordersDef, orders).isRight)
    assert(s3a.defineFeature(FeatureDef.sql("ok", "orders", "numeric",
      spendSql)).isRight)
    s3a.saveDefs()
    graft.operators.BatchedState.writePointer(spark,
      new org.apache.hadoop.fs.Path(s"$s3root/values/_catalog"),
      """{"tables":[{"name":"orders","requiredColumns":["o_custkey"]}],"features":[{"name":"bad","table":"orders","featureType":"numeric","kind":"sql","logic":"SELECT FROM WHERE"}]}""")
    val s3b = new FeatureStore(spark, s"$s3root/values")
    val Left(errs3) = s3b.loadDefs(binder): @unchecked
    assert(errs3.exists(e => e.contains("bad") && e.contains("analysis")))

    // (b2) DUPLICATE names within a hand-edited document refuse whole —
    // last-wins registration would silently serve whichever entry sat
    // later in the JSON array (review wave r18)
    graft.operators.BatchedState.writePointer(spark,
      new org.apache.hadoop.fs.Path(s"$s3root/values/_catalog"),
      s"""{"tables":[{"name":"orders","requiredColumns":["o_custkey"]}],"features":[{"name":"dup","table":"orders","featureType":"numeric","kind":"sql","logic":"${spendSql.replace("\n", " ")}"},{"name":"dup","table":"orders","featureType":"numeric","kind":"closure"}]}""")
    val s3c = new FeatureStore(spark, s"$s3root/values")
    val Left(errsDup) = s3c.loadDefs(binder): @unchecked
    assert(errsDup.exists(e => e.contains("dup") && e.contains("2 times")),
      errsDup.mkString("; "))
    assert(s3c.listFeatures.isEmpty)

    // (c) missing required column in the re-bound table frame → the
    // SchemaValidator refusal names the table
    val Left(errs4) = new FeatureStore(spark, s"$root/values").loadDefs {
      case "customer" => customer.drop("c_acctbal")
      case n => binder(n)
    }: @unchecked
    assert(errs4.exists(e => e.contains("customer") && e.contains("c_acctbal")))
  }

  test("catalog pointer rides the commit-mode knob: manifest-mode save is a directory, loads identically") {
    val root = dir()
    val s1 = new FeatureStore(spark, s"$root/values")
    populate(s1)
    s1.saveDefs(mode = graft.operators.CommitMode.Manifest)
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new org.apache.hadoop.fs.Path(s"$root/values/_catalog")
    assert(hfs.getFileStatus(ptr).isDirectory,
      "manifest-mode catalog must be a manifest directory (zero renames)")
    val s2 = new FeatureStore(spark, s"$root/values")
    val Right(report) = s2.loadDefs(binder): @unchecked
    assert(report.sqlFeatures == Seq("total_spend"))
    // a second save under the same mode appends a new manifest — and a
    // deterministic catalog means the payloads are identical
    s1.saveDefs(mode = graft.operators.CommitMode.Manifest)
    val s3 = new FeatureStore(spark, s"$root/values")
    assert(s3.loadDefs(binder).isRight)
  }

  test("manifest-mode saveDefs performs ZERO renames (the cdfs counter-assertion, G47 discipline)") {
    // the catalog is the 12th pointer site: under the knob its commit
    // path must be create-new only — an armed crash on the FIRST
    // rename through the copy+delete filesystem proves none happen
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.cdfs.impl",
      classOf[graft.operators.CopyDeleteFileSystem].getName)
    c.set("fs.AbstractFileSystem.cdfs.impl",
      classOf[graft.operators.CopyDeleteAbstractFs].getName)
    val root = dir()
    spark.conf.set("spark.graft.commit.mode", "manifest")
    try {
      val s1 = new FeatureStore(spark, s"cdfs:$root/values")
      assert(s1.registerTable(ordersDef, orders).isRight)
      assert(s1.defineFeature(FeatureDef.sql("total_spend", "orders",
        "numeric", spendSql)).isRight)
      val renamesBefore = graft.operators.CopyDeleteFileSystem.renames.get()
      graft.operators.CopyDeleteFileSystem.armCrash(0)
      s1.saveDefs()
      s1.saveDefs() // a second commit appends manifest-1, still no rename
      assert(graft.operators.CopyDeleteFileSystem.renames.get()
        == renamesBefore,
        "saveDefs performed a rename under the manifest knob")
      graft.operators.CopyDeleteFileSystem.armCrash(-1)
      assert(new java.io.File(s"$root/values/_catalog").isDirectory)
      val s2 = new FeatureStore(spark, s"cdfs:$root/values")
      val Right(r) = s2.loadDefs(binder): @unchecked
      assert(r.sqlFeatures == Seq("total_spend"))
    } finally spark.conf.unset("spark.graft.commit.mode")
  }

  test("loadDefs without a saved catalog refuses with the remediation") {
    val s = new FeatureStore(spark, s"${dir()}/values")
    val Left(errs) = s.loadDefs(binder): @unchecked
    assert(errs.exists(_.contains("saveDefs has never completed")))
  }

  test("name collision with an already-registered session refuses whole") {
    val root = dir()
    val s1 = new FeatureStore(spark, s"$root/values")
    populate(s1)
    s1.saveDefs()
    val s2 = new FeatureStore(spark, s"$root/values")
    assert(s2.registerTable(ordersDef, orders).isRight)
    val Left(errs) = s2.loadDefs(binder): @unchecked
    assert(errs.exists(_.contains("already registered")))
    assert(s2.listFeatures.isEmpty, "the collision must abort the whole load")
  }
}
