package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: emails, phone-like digit
  * runs, and IPv4 literals replaced by stable tokens, plus match counts
  * for corpus audit metrics.
  *
  * Pure `regexp_replace`/`regexp_extract_all` compositions — codegen'd,
  * scan-local, zero shuffles at any corpus size. Patterns are kept to
  * the regex subset with identical semantics in Java regex and RE2, so
  * the DuckDB oracle replays them byte-for-byte (NOTES.md invariant).
  *
  * Order matters in [[redactAll]]: emails first (their local parts can
  * contain digit runs a later phone pass would half-mask), then IPv4
  * (dotted digits are NOT valid phone matches here — the phone class
  * has no '.'), then phones.
  */
object Redaction {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** 8+ digits with optional hyphens, starting/ending on a digit. */
  val PhonePattern = "[0-9][0-9-]{6,}[0-9]"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  val EmailToken = "[EMAIL]"
  val PhoneToken = "[PHONE]"
  val IpToken = "[IP]"

  def redact(c: Column, pattern: String, token: String): Column =
    regexp_replace(c, pattern, token)

  /** All three passes, email → IPv4 → phone. */
  def redactAll(c: Column): Column =
    redact(redact(redact(c, EmailPattern, EmailToken), Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** Number of pattern matches (for per-doc PII density metrics). */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))
}
