package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the standard redaction stage of a training-data
  * pipeline (emails / phone numbers / IP addresses replaced by typed
  * placeholder tokens before anything is tokenized or packed).
  *
  * Scale shape: the whole battery is a single codegen'd projection —
  * `regexp_replace`/`regexp_count` are native Catalyst expressions, so
  * redaction rides inside the scan's WholeStageCodegen span with no
  * shuffle, no UDF, and no extra pass over the corpus. At 100 TB the
  * cost is the regex engine per row, nothing structural.
  *
  * Pattern syntax is restricted to the intersection of Java regex and
  * RE2 (character classes, bounded repetition, `\b`) so the DuckDB
  * oracle can run the SAME patterns — no lookaround, no backrefs.
  */
object Redaction {

  /** Conservative RFC-5322-ish local@domain.tld matcher. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic: per-octet range not enforced —
    * redaction wants recall over precision).
    */
  val Ipv4Re: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** NANP-style exchange-subscriber phone fragment (555-0142). */
  val PhoneRe: String = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** All three categories redacted in one fused projection. Order
    * matters and is fixed: emails first (their domains contain dots
    * and digits an IP/phone pattern could bite into), then IPs (dotted
    * digits a phone pattern could partially match), then phones.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-category match counts (computed on the UNredacted text —
    * counting after redaction would undercount overlapping
    * categories).
    */
  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Re))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe))
}
