package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Training-data pipeline scalar kernels: PII scrubbing and
  * repetition-signal building blocks (the C4/Gopher-style quality
  * heuristics and redaction passes a 100 TB pretraining corpus gets
  * before tokenization).
  *
  * All patterns are written in the RE2 ∩ java.util.regex common subset
  * (no lookaround, no backrefs) so the SAME pattern text runs in the
  * engine (codegen'd Java regex) and in the DuckDB oracle (RE2), and so
  * the scan stays linear-time on adversarial documents.
  */
object PipelineOps {

  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** ###-##-#### national-id shape. Must be redacted BEFORE the phone
    * pass (the digits-and-dashes phone pattern would otherwise eat it). */
  val IdPat = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val Ipv4Pat = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  /** international-prefixed digits-and-dashes run. */
  val PhonePat = "\\+[0-9][0-9\\-]{6,}[0-9]"

  /** Replace each PII class with a typed placeholder. Fixed pass order
    * (email, id, ipv4, phone) — later patterns can overlap earlier ones'
    * raw text but never their placeholders. Pure codegen expressions:
    * one projection, no shuffle, safe at any scale. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailPat, "[EMAIL]"),
          IdPat, "[ID]"),
        Ipv4Pat, "[IP]"),
      PhonePat, "[PHONE]")

  /** occurrences of one PII pattern (BIGINT for oracle parity). */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** adjacent-word bigram array of a word array: zip ws with its own
    * tail; the null pad from the length mismatch is filtered out. Array
    * side (no explode) so callers choose the relational shape. */
  def bigrams(ws: Column): Column =
    filter(
      zip_with(ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull)
}
