package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Native THETA sketch aggregate — the fourth mergeable-sketch
  * aggregate (hll_sketch_agg = distinct counts, KllSketchAgg =
  * distributions, FreqSketchAgg = heavy hitters, this = SET
  * OPERATIONS): a theta sketch is a uniform sample of a set's hashed
  * members, so two blobs support union AND intersection AND
  * difference cardinalities — the audience-overlap workload ("how
  * many customers bought in BOTH quarters?") that HLL cannot answer
  * (HLL unions only; inclusion-exclusion on HLL estimates compounds
  * error and can go negative).
  *
  * Exactness contract (the q_agg_approx_hll honesty rule, made
  * precise): below `nominalEntries` retained hashes the sketch is in
  * EXACT mode (theta = 1, every hash kept) and every derived
  * cardinality — including intersections and differences of exact
  * sketches — is exactly right; above it the published relative
  * standard error is 1/sqrt(k) (~1.6% at the 4096 default). The
  * oracled key runs in the exact regime and says so; the spec forces
  * the estimation regime and asserts the band.
  *
  * Same TypedImperativeAggregate rationale as the siblings: the
  * buffer IS the heap Union (theta unions accept raw item updates),
  * serialized compact only at shuffle boundaries. Nulls skipped;
  * all-null groups yield NULL. */
case class ThetaSketchAgg(child: Expression, nominalEntries: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = {
    val r = buffer.getResult
    if (r.isEmpty) null else r.toByteArray
  }

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder()
      .setNominalEntries(nominalEntries).buildUnion()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_theta_agg"
}

object ThetaSketchAgg {

  def fromExprs(exprs: Seq[Expression]): ThetaSketchAgg = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_theta_agg takes exactly 2 arguments (item, nominalEntries), got ${exprs.length}")
    val k = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_theta_agg nominalEntries must be an int literal, got $other")
    }
    require(k >= 16 && (k & (k - 1)) == 0,
      s"nominalEntries must be a power of 2 >= 16, got $k (library contract)")
    ThetaSketchAgg(exprs.head, k)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_theta_agg", fromExprs, "built-in")

  /** Per-group theta sketch column (register first). */
  def theta_agg(c: Column, nominalEntries: Int = 4096): Column =
    call_function("graft_theta_agg", c.cast("string"), lit(nominalEntries))

  private def wrap(b: Array[Byte]) = CompactSketch.wrap(Memory.wrap(b))

  /** |A| estimate (exact below nominalEntries — exact mode). */
  def estimate(a: Array[Byte]): Double = wrap(a).getEstimate

  /** A ∪ B blob. */
  def union(a: Array[Byte], b: Array[Byte], nominalEntries: Int = 4096): Array[Byte] = {
    val u = SetOperation.builder()
      .setNominalEntries(nominalEntries).buildUnion()
    u.union(wrap(a)); u.union(wrap(b))
    u.getResult.toByteArray
  }

  /** A ∩ B blob — the operation HLL cannot express. */
  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.toByteArray
  }

  /** A \ B blob. */
  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(wrap(a), wrap(b)).toByteArray

  /** Retained-entries / exact-mode probe: true while every derived
    * cardinality is exactly right. */
  def isExact(a: Array[Byte]): Boolean = !wrap(a).isEstimationMode
}
