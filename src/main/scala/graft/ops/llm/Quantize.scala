package graft.ops.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization — int8 symmetric (absmax) codes, the
  * standard storage/serving compression for large vector corpora
  * (4× smaller than float32; the same scheme FAISS's SQ8 and the
  * bitsandbytes absmax path use). At 100 TB of embeddings the win is
  * not just disk: a bucketed ANN search over int8 codes moves a
  * quarter of the bytes through every shuffle and scan.
  *
  * All arithmetic is double-precision IEEE (`x * 127 / scale + 0.5`
  * then `floor`) — identical bit-for-bit across engines, so the codes
  * are oracle-able. `floor(x + 0.5)` is explicit half-up rounding:
  * both engines agree exactly, where `round()`'s half-even/half-away
  * rules differ per type and engine (PARITY rule 5 precedent).
  *
  * Scale shape: narrow per-row projections — no shuffle.
  */
object Quantize {

  /** Per-vector absmax scale (0.0 for the all-zero vector). */
  def absmaxScale(v: Column): Column =
    array_max(transform(v, x => abs(x)))

  /** Symmetric int8 codes in [-127, 127]: code = floor(x·127/scale
    * + 0.5). The max-magnitude element maps to ±127 exactly; a zero
    * scale (degenerate all-zero vector) yields all-zero codes instead
    * of NaN poison — same guard class as Knn's zero-norm fix. */
  def int8Codes(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0))
        .otherwise(floor(x * lit(127.0) / scale + lit(0.5)).cast("int")))

  /** Reconstruct doubles from codes: x̂ = code·scale/127. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c * scale / lit(127.0))

  /** Max absolute reconstruction error per vector — the quality gauge
    * (bounded by scale/254 + ulp noise for absmax int8). */
  def maxAbsError(v: Column, codes: Column, scale: Column): Column =
    array_max(zip_with(v, dequantize(codes, scale),
      (x, xhat) => abs(x - xhat)))
}
