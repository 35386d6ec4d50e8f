package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine-exact arithmetic helpers.
  *
  * The driver's correctness gate hash-compares our parquet output against
  * DuckDB running the oracle SQL. Double-precision SUMs are order-dependent
  * (Spark partial aggregation vs DuckDB's scan order), so any floating sum
  * would differ in the last ulps and fail the hash. Convention used by every
  * query in this repo:
  *
  *   - monetary / 2-dp columns  -> DECIMAL(12,2)  (exact sum in both engines)
  *   - rates (discount, tax)    -> DECIMAL(4,2)
  *   - free doubles to be summed-> DECIMAL(18,6)  (both engines round the
  *     double to nearest 6-dp decimal; identical because the double is never
  *     exactly on a midpoint)
  *   - final results            -> cast the exact decimal to DOUBLE (IEEE
  *     nearest; bit-identical in both engines)
  *   - averages                 -> CAST(exact-decimal-sum AS DOUBLE)/COUNT(*)
  *
  * Derived factors like (1 - discount) are cast back to DECIMAL(4,2) to keep
  * product precision far below 38 digits, where Spark and DuckDB would start
  * applying different precision-loss rules.
  */
object Exact {
  /** 2-dp money/rate column -> integer cents (long) via
    * floor(x·100 + 0.5) — NOT round(): Spark's Round on doubles goes
    * through BigDecimal.setScale per row, the very allocation this layer
    * exists to avoid (measured at 50×: round-cents 11-17 s vs
    * floor-cents 3.9-4.3 s on q1, right at the unordered-double floor).
    * floor(x+0.5) equals HALF_UP rounding for the non-negative money and
    * rate columns it is applied to (both engines compute the identical
    * IEEE product, so the floor is identical too); Spark's floor(double)
    * returns LongType directly. ~1e18 cents-long headroom — see
    * CoreQueries.q1Pricing for the overflow note. */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5))

  /** revenue term in 1e-4-dollar units: price_cents × (100 − disc_pts).
    * Divide the long SUM by 1e4 (as double) for dollars. */
  def revC(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - cents(discount))

  /** 2-dp money column -> exact decimal. Prefer [[cents]] for sums on
    * hot paths; DECIMAL remains for squared terms and anywhere cents
    * headroom is a real risk (e.g. feat_zscore's Σx²). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** small 2-dp rate -> exact decimal. */
  def pct2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** arbitrary double -> 6-dp decimal (deterministic nearest rounding). */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  def dbl(c: Column): Column = c.cast(DoubleType)

  /** (1 - rate) kept at DECIMAL(4,2) so downstream products stay exact. */
  def oneMinus(rate: Column): Column = (lit(1) - pct2(rate)).cast(DecimalType(4, 2))

  /** (1 + rate) kept at DECIMAL(4,2). */
  def onePlus(rate: Column): Column = (lit(1) + pct2(rate)).cast(DecimalType(4, 2))
}
