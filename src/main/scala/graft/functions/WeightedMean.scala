package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the user-facing UDAF surface): weighted mean of
  * (value, weight) pairs. Pure arithmetic — merge order only affects the
  * last ulp of the sums, and query-level rounding absorbs that.
  *
  * Demonstrates the `Aggregator[IN, BUF, OUT]` path: Catalyst plans it as a
  * two-phase (partial/final) aggregate, so the map-side combine behavior at
  * scale matches built-in sums.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form over two double columns. */
  def weightedMean(value: Column, weight: Column): Column =
    org.apache.spark.sql.functions.udaf(WeightedMean,
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      .apply(value, weight)
}
