package graft

/** Whitespace classes pinned to RE2 semantics for oracle parity.
  *
  * The DuckDB oracle's regex engine is RE2, where `\s` is
  * `[\t\n\f\r ]`; Java's `\s` additionally matches U+000B (vertical
  * tab). Every oracled Spark path that tokenizes or collapses
  * whitespace on RAW text must use these explicit classes instead of
  * `\\s`, or parity silently diverges on any corpus containing `\x0B`
  * (review finding carried from round 5, closed round 7). Paths that
  * first map non-alphanumerics to spaces (TextUdf.normalize) are
  * exempt — `\x0B` is gone before the collapse either way.
  */
object Ws {
  /** One RE2-`\s` character: `[ \t\n\f\r]` (NO `\x0B`). */
  val S = "[ \\t\\n\\f\\r]"
  /** A run of RE2-`\s` characters. */
  val Plus = "[ \\t\\n\\f\\r]+"
}
