package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization pipeline for training-data prep: Unicode NFC
  * (compiled kernel with an ASCII fast path), casefolding, PII/URL
  * scrubbing, and whitespace canonicalization — all codegen'd
  * built-ins plus the NFC expression, so the whole cleaning chain
  * stays inside one whole-stage-codegen span over the scan. */
object TextNorm {

  /** Email-ish and URL-ish patterns kept deliberately simple so the
    * DuckDB oracle (same regex source text) matches byte for byte. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^ ]+"

  /** NFC normalization (graft compiled expression). */
  def nfc(text: Column): Column = graft.functions.TextExpressions.nfc_normalize(text)

  /** Replace emails/URLs with placeholder tokens. */
  def scrub(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"), urlPattern, "<URL>")

  /** The full cleaning chain: NFC -> lowercase -> scrub -> whitespace
    * squeeze -> trim. */
  def clean(text: Column): Column =
    trim(regexp_replace(scrub(lower(nfc(text))), "\\s+", " "))
}
