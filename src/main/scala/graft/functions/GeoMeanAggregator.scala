package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed [[Aggregator]] (the scalar sibling of
  * [[TopKAggregator]]): buffer = (Σ ln x, n), merge is component-wise
  * addition, finish = exp(Σ/n). Registered as a SQL UDAF in q179 via
  * `functions.udaf` — the partial-aggregating (map-side combining) UDAF
  * lane, in contrast to the q178 row-scalar UDF lane. Non-positive inputs
  * are the caller's responsibility (q179 filters value > 0).
  */
object GeoMeanAggregator extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1L)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0L) Double.NaN else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
