package graft.text

/** PII detection + redaction — the scrub pass a pretraining pipeline
  * runs over raw text before anything ships (emails, phone-shaped
  * numbers, IPv4 addresses). Pure regex column expressions: codegen'd,
  * scan-parallel, shuffle-free — the per-row cost IS the regex engine,
  * which is the industry-standard shape for this pass (Presidio-style
  * recognizers are regex banks too).
  *
  * Regexes are written in the portable subset shared by Java regex
  * (Spark) and RE2 (DuckDB oracles): character classes + bounded
  * repetition, `[.]` instead of backslash escapes (keeps SQL string
  * literals escape-free on both engines).
  */
object PII {

  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
  val ipRe = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val phoneRe = "[0-9]{3}-[0-9]{4}"

  /** Per-category hit counts. */
  def flagExprs(col: String): Seq[(String, String)] = Seq(
    "n_pii_emails" -> s"size(regexp_extract_all($col, '$emailRe', 0))",
    "n_pii_ips" -> s"size(regexp_extract_all($col, '$ipRe', 0))",
    "n_pii_phones" -> s"size(regexp_extract_all($col, '$phoneRe', 0))")

  /** Redacted text: emails → <EMAIL> first (their digit runs must not
    * leak into the later passes), then IPv4 → <IP> (dots), then
    * phone-shaped digits → <PHONE>. Spark's regexp_replace is global,
    * matching the oracle's 'g' flag. */
  def redactExpr(col: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($col,
          '$emailRe', '<EMAIL>'),
          '$ipRe', '<IP>'),
          '$phoneRe', '<PHONE>')"""
}
