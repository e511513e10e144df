package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** MERGEABLE quantile sketches (the datasketches KLL algorithm —
  * Karnin/Lang/Liberty FOCS'16) over a DataFrame column — the third
  * member of the approx family beside HLL (distinct counts) and
  * frequent-items (top-k): value DISTRIBUTIONS, i.e. the histogram a
  * cost-based optimizer's selectivity estimates actually need, and
  * the percentile dashboards monitoring runs on.
  *
  * Why not `percentile_approx`? Its summary is not exposed as a
  * mergeable, persistable value — every call re-scans the data. A KLL
  * sketch serializes to a bounded blob, merges associatively, and
  * carries a PUBLISHED error bound (normalized rank error ≈ 1.65% at
  * the default k=200, two-sided), which is what lets [[graft.ops.cdc
  * .StatsMaintain]] keep a quantile profile fresh from the CDF: union
  * the insert window's sketch into the stored one, O(window) not
  * O(table).
  *
  * Execution shape: ONE sketch per partition built imperatively
  * (`mapPartitions` is the honest tool here — the sketch update loop
  * is genuine per-partition imperative state no Column expression
  * expresses), then the ≤numPartitions blobs merge driver-side —
  * bounded driver state, the codebook class. Nulls are skipped (the
  * aggregate-function convention). */
object KllQuantiles {

  val DefaultK = 200

  /** Serialized KLL sketch of `column` (cast to double), or None if
    * every value is null / the frame is empty. */
  def sketchOf(df: DataFrame, column: Column, k: Int = DefaultK): Option[Array[Byte]] = {
    val blobs = df.select(column.cast("double").as("v"))
      .na.drop("all", Seq("v"))
      .mapPartitions { it =>
        val sk = KllDoublesSketch.newHeapInstance(k)
        it.foreach(r => if (!r.isNullAt(0)) sk.update(r.getDouble(0)))
        if (sk.isEmpty) Iterator.empty else Iterator(sk.toByteArray)
      }(org.apache.spark.sql.Encoders.BINARY)
      .collect()
    if (blobs.isEmpty) None else Some(blobs.reduce(merge))
  }

  def sketchOf(df: DataFrame, column: String): Option[Array[Byte]] =
    sketchOf(df, col(column))

  /** Associative merge of two serialized sketches. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = KllDoublesSketch.heapify(Memory.wrap(a))
    sa.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    sa.toByteArray
  }

  /** Quantile estimates at the given ranks (0..1, inclusive rule). */
  def quantiles(bytes: Array[Byte], ranks: Seq[Double]): Seq[Double] = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    ranks.map(sk.getQuantile)
  }

  /** Estimated rank (0..1) of `value` — the selectivity of
    * `col <= value`, the predicate a CBO prices with this sketch. */
  def rankOf(bytes: Array[Byte], value: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getRank(value)

  /** Items the sketch has absorbed (exact — KLL tracks n). */
  def countOf(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN
}
