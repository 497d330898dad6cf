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
  /** one valid dotted-quad octet, 0–255 (leftmost-first alternation is
    * identical in RE2 and java.util.regex). */
  private val Ipv4Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  /** bare dotted-quad with octet range check (no boundary context). */
  val Ipv4Pat = s"($Ipv4Octet\\.){3}$Ipv4Octet"
  /** Ipv4Pat wrapped in digit/dot boundary guards. Lookaround isn't in
    * the RE2 subset, so the guards are CAPTURING context (restored via
    * $1/$6 in the replacement): group 1 = leading context, 2 = the IP,
    * 3–5 = octet internals, 6 = trailing context. Rejects matches
    * inside longer dotted-digit runs ('1.2.3.4.5' redacts nothing) and
    * invalid octets ('999.999.999.999' redacts nothing). Known limit:
    * two IPs separated by ONE char ("a.b.c.d e.f.g.h") — the first
    * match consumes the separator, so the second keeps its raw text;
    * acceptable for a redaction pass (never corrupts, may under-redact
    * in that rare adjacency). */
  val Ipv4CtxPat = s"(^|[^0-9.])($Ipv4Pat)([^0-9.]|$$)"
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
        Ipv4CtxPat, "$1[IP]$6"),
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
