package graft.ops.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass a pretraining corpus
  * runs before anything else sees the text. Pattern-based (email,
  * IPv4, US-style phone): the same tier every public pipeline starts
  * with (C4's bad-words pass, Dolma's PII taggers); model-based NER is
  * an orthogonal upgrade that slots behind the same column API.
  *
  * All patterns restrict to constructs with IDENTICAL semantics in
  * Java regex (Spark) and RE2 (DuckDB): character classes, bounded
  * repetition, `\b`, `\d` — no backrefs, no lookaround. That keeps
  * every operator here oracle-able.
  *
  * Scale shape: narrow projections (regexp over one column) — no
  * shuffle, fully codegen'd, safe at any corpus size.
  */
object PiiRedact {

  val EmailPattern: String = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhonePattern: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Non-overlapping match count of `pattern` (left-to-right, the same
    * scan rule both engines use). */
  def countMatches(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** Replace every match of each pattern with its placeholder.
    * Order matters and is fixed: email first (its local part may
    * contain digit runs a later pattern could chew on), then phone,
    * then IPv4 — the oracle SQL must apply the same order. */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "<EMAIL>")
    val p = regexp_replace(e, PhonePattern, "<PHONE>")
    regexp_replace(p, Ipv4Pattern, "<IP>")
  }

  /** True iff the text contains any of the PII patterns. */
  def hasPii(text: Column): Column =
    countMatches(text, EmailPattern) +
      countMatches(text, PhonePattern) +
      countMatches(text, Ipv4Pattern) > 0
}
