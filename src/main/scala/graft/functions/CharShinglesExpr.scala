package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass char-shingle kernel: lowercase → collapse `\s+` runs to
  * one space → distinct n-char windows, in ONE code-point scan.
  *
  * Bit-identical to the readable HOF reference
  * (`regexp_replace(lower(text), Ws.Plus, " ")` in its own projection,
  * then `NearDup.charShingles`) — CharShinglesSpec asserts element-
  * for-element equality on the corpus and on edge strings. The HOF
  * pipeline pays an interpreted lambda per window plus an `array_sort`
  * comparator per element; this kernel is the hot path of the
  * shingle-dedup family (q_llm_ngram_jaccard, q_llm_dedup_cluster,
  * shingleNearDups), measured ~5× on the sf0.1 corpus.
  *
  * Semantics pinned to the reference formulation:
  *  - whitespace = RE2 `\s` = [ \t\n\f\r] (graft.Ws) — the oracle's
  *    regex engine; NOT Java `\s`, which adds \x0B and would diverge
  *    on a corpus containing a vertical tab (closed round 7);
  *  - a whitespace RUN anywhere (including leading/trailing) becomes
  *    exactly one space — `regexp_replace` does not trim;
  *  - windows count CODE POINTS (SQL substr/length semantics), so
  *    non-BMP text shingles identically to the HOF version;
  *  - a string shorter than n yields itself (sequence(1, greatest(
  *    len-n+1, 1)) semantics);
  *  - distinct keeps first occurrence (array_distinct semantics).
  */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_char_shingles requires a string argument, got ${child.dataType.catalogString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"shingle width must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_shingles"

  override def nullSafeEval(input: Any): Any =
    CharShingles.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharShingles$$.MODULE$$.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingles {

  /** Called from both interpreted eval and generated code. */
  def shingle(s: UTF8String, n: Int): GenericArrayData = {
    // lower() first — full-string UTF8String.toLowerCase, the exact
    // semantics of the lower() builtin the reference pipeline uses
    val lowered = s.toLowerCase.toString
    // normalize into code points (SQL substr counts code points)
    val cps = new Array[Int](lowered.length)
    var m = 0
    var pendingSpace = false
    var i = 0
    while (i < lowered.length) {
      val cp = lowered.codePointAt(i)
      i += Character.charCount(cp)
      // RE2 `\s` = [ \t\n\f\r] — NO \x0B. The DuckDB oracle is RE2;
      // including the vertical tab (Java `\s`) would silently diverge
      // on any corpus containing one (graft.Ws has the full rationale)
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' ||
        cp == '\f' || cp == '\r'
      if (isWs) pendingSpace = true
      else {
        if (pendingSpace) { cps(m) = ' '; m += 1; pendingSpace = false }
        cps(m) = cp; m += 1
      }
    }
    // trailing run → one space; a LEADING run already flushed as ' '
    // before the first non-ws char above (regexp_replace does not trim)
    if (pendingSpace) { cps(m) = ' '; m += 1 }
    val windows = math.max(m - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String](windows * 2)
    var w = 0
    while (w < windows) {
      val len = math.min(n, m - w)
      seen.add(UTF8String.fromString(new String(cps, w, math.max(len, 0))))
      w += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Shared builder for BOTH registration paths (temp function here,
    * SparkSessionExtensions in GraftExtensions) — one place decides
    * the accepted literal forms, so the two session flavors cannot
    * diverge. */
  def fromExprs(exprs: Seq[Expression]): CharShingles = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_char_shingles takes exactly 2 arguments (text, width), got ${exprs.length}")
    val width = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_char_shingles width must be an int literal, got $other")
    }
    CharShingles(exprs.head, width)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_shingles", fromExprs, "built-in")

  def shingles_native(c: Column, n: Int): Column =
    call_function("graft_char_shingles", c, org.apache.spark.sql.functions.lit(n))
}
