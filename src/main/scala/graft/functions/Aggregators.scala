package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset aggregators — the `Aggregator[IN, BUF, OUT]` surface for
  * feature computations where case-class type safety matters. Buffers are
  * algebraic (mergeable), so Spark plans them with map-side partial
  * aggregation like any built-in. */
object Aggregators {

  /** Weighted mean: Σ(w·x)/Σ(w) — e.g. recency-weighted feature values. */
  case class WSum(wx: Double, w: Double)
  class WeightedMean[I](x: I => Double, wt: I => Double)
      extends Aggregator[I, WSum, Double] {
    def zero: WSum = WSum(0.0, 0.0)
    def reduce(b: WSum, a: I): WSum = WSum(b.wx + x(a) * wt(a), b.w + wt(a))
    def merge(b1: WSum, b2: WSum): WSum = WSum(b1.wx + b2.wx, b1.w + b2.w)
    def finish(r: WSum): Double = if (r.w == 0.0) Double.NaN else r.wx / r.w
    def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Numerically stable online variance (Chan et al. merge) — a feature
    * statistic computable in one distributed pass. */
  case class VarBuf(n: Long, mean: Double, m2: Double)
  class OnlineVariance[I](x: I => Double) extends Aggregator[I, VarBuf, Double] {
    def zero: VarBuf = VarBuf(0L, 0.0, 0.0)
    def reduce(b: VarBuf, a: I): VarBuf = {
      val v = x(a); val n = b.n + 1
      val d = v - b.mean
      val mean = b.mean + d / n
      VarBuf(n, mean, b.m2 + d * (v - mean))
    }
    def merge(b1: VarBuf, b2: VarBuf): VarBuf = {
      if (b1.n == 0) b2 else if (b2.n == 0) b1
      else {
        val n = b1.n + b2.n
        val d = b2.mean - b1.mean
        VarBuf(n, b1.mean + d * b2.n / n,
          b1.m2 + b2.m2 + d * d * b1.n * b2.n / n)
      }
    }
    def finish(r: VarBuf): Double = if (r.n < 2) Double.NaN else r.m2 / (r.n - 1)
    def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
