package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The card must be the same verdicts the gates evaluate, aggregated —
  * per-source numbers equal to running each rule core directly, a total
  * row recombined exactly from numerators, a duplication estimate that
  * tracks the exact count, and no doc-keyed join anywhere in the plan. */
class CorpusReportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "text", "source").cache()

  test("per-source volumes and rule-family rates equal the cores run directly; the total row recombines numerators exactly") {
    val got = CorpusReport.report(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val srcOf = docs.select("doc_id", "source").as[(Long, String)]
      .collect().toMap
    val sources = srcOf.values.toSet
    assert(got.keySet === sources + CorpusReport.TotalRow)

    // volumes against a direct computation
    val volRef = docs.select(col("source"),
        size(filter(split(col("text"), " "), w => length(w) > 0)).as("t"),
        length(col("text")).as("c"))
      .as[(String, Int, Int)].collect()
      .groupBy(_._1).map { case (s, rs) =>
        s -> (rs.length.toLong, rs.map(_._2.toLong).sum, rs.map(_._3.toLong).sum) }
    volRef.foreach { case (s, (nd, nt, nc)) =>
      val r = got(s)
      assert(r.getLong(1) === nd && r.getLong(2) === nt && r.getLong(3) === nc,
        s"volumes for $s")
      assert(math.abs(r.getDouble(4) - nt.toDouble / nd) < 1e-12)
    }

    // each rate = the shared core's per-doc verdicts, aggregated in
    // the spec through the id->source map (never through the operator)
    def rateOf(perDoc: Map[Long, Boolean]): Map[String, Double] =
      perDoc.groupBy { case (id, _) => srcOf(id) }
        .map { case (s, m) => s -> m.count(_._2).toDouble / m.size }
    val gq = rateOf(QualityOps.qualityFlags(docs)
      .select("doc_id", "pass").as[(Long, Boolean)].collect().toMap)
    val rq = rateOf(GopherRepetition.repetitionFlags(docs)
      .select("doc_id", "pass_repetition").as[(Long, Boolean)].collect().toMap)
    val cq = rateOf(C4Filters.c4Clean(docs)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap)
    sources.foreach { s =>
      val r = got(s)
      assert(math.abs(r.getDouble(7) - gq(s)) < 1e-12, s"gopher rate $s")
      assert(math.abs(r.getDouble(8) - rq(s)) < 1e-12, s"repetition rate $s")
      assert(math.abs(r.getDouble(9) - cq(s)) < 1e-12, s"c4 rate $s")
    }

    // the total row: counts sum; rates recombine from numerators (the
    // weighted mean, never the mean of rates)
    val t = got(CorpusReport.TotalRow)
    assert(t.getLong(1) === srcOf.size.toLong)
    assert(t.getLong(2) === volRef.values.map(_._2).sum)
    val totalGopherRate = sources.toSeq
      .map(s => gq(s) * got(s).getLong(1)).sum / srcOf.size
    assert(math.abs(t.getDouble(7) - totalGopherRate) < 1e-9)
  }

  test("duplication estimate tracks the exact distinct count, including seeded duplicates") {
    val dupText = docs.filter(col("doc_id") === 1).select("text")
      .as[String].head()
    val seeded = docs.unionByName(
      Seq((900001L, dupText, "src0"), (900002L, dupText, "src0"),
        (900003L, dupText, "src0")).toDF("doc_id", "text", "source"))
    val r = CorpusReport.report(seeded).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = seeded.groupBy("source")
      .agg(countDistinct(col("text")).as("d"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    exact.foreach { case (s, (d, n)) =>
      val est = r(s).getLong(5)
      assert(math.abs(est - d) <= math.max(2L, (0.1 * d).toLong),
        s"$s distinct estimate $est vs exact $d")
      assert(r(s).getDouble(6) === 1.0 - est.toDouble / n)
    }
  }

  test("plan: fused to one pass — no join at all, one aggregation over one Expand, text never expands") {
    // r17 directive 5: the three rule families + volumes ride ONE
    // chained projection and ONE rollup — the pre-fusion shape scanned
    // the corpus once per family and joined the numerator frames
    val qe = CorpusReport.report(docs).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Join"),
      s"the fused card must not join at all:\n$plan")
    assert(plan.contains("Expand"),
      s"rollup's grouping-set Expand missing — total row shape changed:\n$plan")
    // the text column must be reduced to numeric measures BEFORE the
    // Expand duplicates rows per grouping set (expanding text would
    // double the heavy tokenization)
    val expandLine = plan.linesIterator.find(_.contains("Expand")).get
    assert(!expandLine.contains("text"),
      s"Expand carries the text column:\n$expandLine")
    // exactly one aggregation pair (partial+final) over the corpus:
    // the optimized plan holds a single Aggregate over the chain
    val agg = qe.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(agg.size === 1, s"expected ONE fused aggregate, got ${agg.size}")
  }

  test("guards: missing columns fail loudly") {
    intercept[IllegalArgumentException] {
      CorpusReport.report(docs.drop("source"))
    }
  }
}
