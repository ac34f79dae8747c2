package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Root-sum-of-squares margin aggregation as a reusable typed
  * `Aggregator` (SURVEY §2.8: "RssAgg: Aggregator[Double, Double, Double]
  * = sum of squares then sqrt") — the typed-Dataset counterpart of the
  * expression form in [[AcsMath.aggSumM]]. Partial-aggregation friendly:
  * the buffer is a plain sum of squares, merged associatively.
  */
object RssAgg extends Aggregator[Double, Double, Double] {
  override def zero: Double = 0.0
  override def reduce(buf: Double, m90: Double): Double = buf + m90 * m90
  override def merge(b1: Double, b2: Double): Double = b1 + b2
  override def finish(sumSq: Double): Double = math.sqrt(sumSq)
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Typed column for `ds.select(RssAgg.column)` / typed groupBy agg. */
  def column: TypedColumn[Double, Double] = toColumn

  /** Register as a SQL/DataFrame UDAF named `rss`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("rss", org.apache.spark.sql.functions.udaf(this))
}
