package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Drives the real extension path: apply GraftExtensions to a
  * SparkSessionExtensions instance and register its functions into the
  * live session's registry (exactly what session construction does with
  * spark.sql.extensions=graft.GraftExtensions), then exercise each
  * function through pure SQL. */
class GraftExtensionsSpec extends SparkSpec {

  test("injected SQL functions evaluate end-to-end") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.ExtensionsTestBridge.register(
      ext, spark.sessionState.functionRegistry)

    val dot = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .first().getDouble(0)
    assert(dot === 11.0)

    val cos = spark.sql(
      "SELECT vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .first().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    // pq round-trip: 2 subspaces of 1 dim, codebook [j=0: 0,10; j=1: 0,10]
    // vec (9, 1) -> codes (1, 0); tab = dots; adc = 9*10 + 1*0
    val row = spark.sql(
      """SELECT pq_adc(
        |  pq_encode(array(CAST(9.0 AS FLOAT), CAST(1.0 AS FLOAT)), cb, 2, 2),
        |  pq_tab(array(CAST(9.0 AS FLOAT), CAST(1.0 AS FLOAT)), cb, 2, 2)) AS s
        |FROM (SELECT array(CAST(0.0 AS FLOAT), CAST(10.0 AS FLOAT),
        |                   CAST(0.0 AS FLOAT), CAST(10.0 AS FLOAT)) AS cb)""".stripMargin)
      .first().getDouble(0)
    // codes: sub0 nearest(9 | {0,10}) = 10 -> code 1; sub1 nearest(1) = 0 -> code 0
    // tab: [0*9, 10*9, 0*1, 10*1]; adc = tab[1] + tab[2] = 90 + 0
    assert(row === 90.0)

    val accents = spark.sql(
      "SELECT strip_accents('caf\u00e9 NA\u00cfVE stra\u00dfe') AS a")
      .first().getString(0)
    assert(accents === "cafe NAIVE stra\u00dfe")

    // "caf\u00c3\u00a9" (UTF-8 bytes of caf\u00e9 mis-decoded as Latin-1) repairs
    val fixed = spark.sql(
      "SELECT fix_mojibake('caf\u00c3\u00a9') AS f").first().getString(0)
    assert(fixed === "caf\u00e9")

    // non-literal m rejected loudly, not silently misparsed
    val err = intercept[Exception] {
      spark.sql("SELECT pq_encode(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)), 1 + 0, 2)")
        .collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getCause != null && err.getCause.getMessage.contains("integer literal"))
  }
}
