package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF (§2-D q_udaf_weighted_avg): weight-weighted mean.
  *
  * Aggregator[IN, BUF, OUT] gives Spark a true partial-aggregate:
  * `reduce` runs map-side per partition, `merge` combines partition
  * buffers at the final stage — so the shuffle carries one (sum, wsum)
  * pair per partition, exactly like a built-in agg. This is the
  * scalable UDAF shape (vs a collect-and-fold UDF).
  */
object WeightedAvg {

  case class Buf(var sum: Double, var wsum: Double)

  val aggregator: Aggregator[(Double, Double), Buf, Double] =
    new Aggregator[(Double, Double), Buf, Double] {
      override def zero: Buf = Buf(0.0, 0.0)
      override def reduce(b: Buf, in: (Double, Double)): Buf = {
        b.sum += in._1 * in._2; b.wsum += in._2; b
      }
      override def merge(a: Buf, b: Buf): Buf = {
        a.sum += b.sum; a.wsum += b.wsum; a
      }
      override def finish(b: Buf): Double =
        if (b.wsum == 0.0) Double.NaN else b.sum / b.wsum
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  private val fn = udaf(aggregator)

  /** weighted_avg(value, weight) as a Column aggregate. */
  def weighted_avg(value: Column, weight: Column): Column =
    fn(value, weight)
}
