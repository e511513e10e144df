package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Native per-group FREQUENT-ITEMS sketch aggregate — the third
  * mergeable-sketch aggregate beside the built-in `hll_sketch_agg`
  * (distinct counts) and [[KllSketchAgg]] (distributions): heavy
  * hitters. Spark 4's `approx_top_k` RESOLVES the top-k inside the
  * aggregate and returns rows, which is right for a one-shot query
  * ([[graft.ops.llm.FreqTerms]]) but useless for MAINTENANCE — a
  * maintained profile needs the mergeable BLOB, so a CDF window's
  * sketch can union into a stored one (the QuantileMaintain shape;
  * frequent-items merge is associative and the datasketches error
  * bound survives union). Same TypedImperativeAggregate rationale as
  * KllSketchAgg: the buffer IS the heap sketch, serialized only at
  * shuffle boundaries. `maxMapSize` must be a power of 2 (library
  * contract, enforced at registration); nulls skipped; all-null
  * groups yield NULL. Blobs interoperate with [[FreqSketchAgg.merge]]
  * / [[FreqSketchAgg.topK]]. */
case class FreqSketchAgg(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    if (buffer.isEmpty) null
    else buffer.toByteArray(new ArrayOfStringsSerDe)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_freq_agg"
}

object FreqSketchAgg {

  def fromExprs(exprs: Seq[Expression]): FreqSketchAgg = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_freq_agg takes exactly 2 arguments (item, maxMapSize), got ${exprs.length}")
    val m = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_freq_agg maxMapSize must be an int literal, got $other")
    }
    require(m >= 2 && (m & (m - 1)) == 0,
      s"maxMapSize must be a power of 2 >= 2, got $m (library contract)")
    FreqSketchAgg(exprs.head, m)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_freq_agg", fromExprs, "built-in")

  /** Per-group frequent-items sketch column (register first). */
  def freq_agg(c: Column, maxMapSize: Int = 256): Column =
    call_function("graft_freq_agg", c.cast("string"), lit(maxMapSize))

  /** Associative merge of two serialized sketches. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = ItemsSketch.getInstance[String](Memory.wrap(a),
      new ArrayOfStringsSerDe)
    sa.merge(ItemsSketch.getInstance[String](Memory.wrap(b),
      new ArrayOfStringsSerDe))
    sa.toByteArray(new ArrayOfStringsSerDe)
  }

  /** Top-k (item, estimate, lower, upper) from a blob — NO_FALSE_
    * NEGATIVES rule: every true heavy hitter above the error band
    * appears. */
  def topK(bytes: Array[Byte], k: Int): Seq[(String, Long, Long, Long)] = {
    val sk = ItemsSketch.getInstance[String](Memory.wrap(bytes),
      new ArrayOfStringsSerDe)
    sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .take(k).map(r => (r.getItem, r.getEstimate, r.getLowerBound,
        r.getUpperBound)).toSeq
  }

  /** Exact-when-never-evicted total stream length carried by the blob. */
  def streamLength(bytes: Array[Byte]): Long =
    ItemsSketch.getInstance[String](Memory.wrap(bytes),
      new ArrayOfStringsSerDe).getStreamLength
}
