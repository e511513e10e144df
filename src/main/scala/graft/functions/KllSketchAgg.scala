package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Native per-group KLL quantile-sketch aggregate — the
  * TypedImperativeAggregate the UDAF survey note (§4.3) reserved for
  * sketch types. [[KllQuantiles.sketchOf]] builds ONE sketch for a
  * whole frame (mapPartitions + driver-side reduce — right for a
  * table profile); this is the GROUPED form: `groupBy(g).agg(
  * kll_agg($"v"))` yields one mergeable blob per group in a single
  * shuffle with map-side partials — per-tenant/per-language latency
  * and size distributions at 100 TB, where per-group exact percentiles
  * would shuffle every value.
  *
  * Why TypedImperativeAggregate and not `Aggregator`/udaf: the buffer
  * IS the heap sketch object, updated in place per row and serialized
  * ONLY at shuffle boundaries — an Aggregator's encoder round-trips
  * the buffer per row (heapify + toByteArray ~every update), which is
  * exactly the overhead this Catalyst-native form exists to avoid.
  * Nulls are skipped (aggregate-function convention); an all-null
  * group yields NULL (matching what `percentile` returns). The
  * emitted blob interoperates with [[KllQuantiles]] (same library
  * encoding): merge/quantiles/rankOf/countOf all apply. */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_kll_agg"
}

object KllSketchAgg {

  /** Shared builder for the registry (the CharShingles convention —
    * one place decides accepted literal forms). Input must already be
    * DoubleType; the [[kll_agg]] wrapper inserts the cast. */
  def fromExprs(exprs: Seq[Expression]): KllSketchAgg = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_kll_agg takes exactly 2 arguments (value, k), got ${exprs.length}")
    val k = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_kll_agg k must be an int literal, got $other")
    }
    KllSketchAgg(exprs.head, k)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kll_agg", fromExprs, "built-in")

  /** Per-group KLL sketch column (register the function first). */
  def kll_agg(c: Column, k: Int = KllQuantiles.DefaultK): Column =
    call_function("graft_kll_agg",
      c.cast("double"), lit(k))
}
