package graft.ops.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Boilerplate text cleaning — the strip pass between raw capture and
  * tokenization in a pretraining pipeline: URLs out, HTML tags out,
  * whitespace renormalized. Same design rules as [[PiiRedact]]: every
  * pattern restricts to Java-regex ∩ RE2 constructs (character
  * classes, bounded alternation — no backrefs, no lookaround) so the
  * operator stays oracle-able, and the pass order is FIXED: TAGS
  * first (a tag match swallows any URL inside its attributes — the
  * reverse order lets an href URL eat the tag's closing `>` and leave
  * `<a href="` shrapnel behind), then bare URLs, then whitespace
  * collapse+trim.
  *
  * Scale shape: narrow per-row projection — no shuffle.
  */
object TextClean {

  val UrlPattern: String = "https?://[^ \\t\\n\\r]+"
  val HtmlTagPattern: String = "</?[a-zA-Z][^<>]*>"

  /** Non-overlapping match count — one implementation, shared contract:
    * see [[PiiRedact.countMatches]]. */
  def countMatches(text: Column, pattern: String): Column =
    PiiRedact.countMatches(text, pattern)

  /** Strip tags then URLs, collapse whitespace runs, trim. */
  def clean(text: Column): Column = {
    val noTag = regexp_replace(text, HtmlTagPattern, " ")
    val noUrl = regexp_replace(noTag, UrlPattern, " ")
    trim(regexp_replace(noUrl, graft.Ws.Plus, " "))
  }
}
