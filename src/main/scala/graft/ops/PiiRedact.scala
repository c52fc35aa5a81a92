package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation: the standard
  * scrub pass that replaces emails / phone numbers / IP addresses with
  * typed placeholder tokens before text reaches a training corpus
  * (the C4 pipeline's "clean" stage and every production crawl pipeline
  * since carry an equivalent step).
  *
  * Pure per-row regexp_replace/regexp_count over codegen'd built-ins —
  * no UDFs, no shuffles, embarrassingly parallel at any corpus size.
  * Patterns are deliberately restricted to constructs whose semantics
  * are identical in Java regex (Spark) and RE2 (DuckDB oracle): ASCII
  * character classes, bounded quantifiers, and \b word boundaries.
  */
object PiiRedact {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Replacement order is part of the contract (emails can contain
    * digits and dots, so they are consumed first; IPs before phones so
    * dotted quads never half-match the phone pattern). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailPattern), lit("[EMAIL]")),
        lit(Ipv4Pattern), lit("[IP]")),
      lit(PhonePattern), lit("[PHONE]"))

  /** URL pattern with the host as capture group 1 — the C4-pipeline
    * blocklist-filter shape (Raffel et al. 2020 §2.2 drops pages from
    * listed domains). Same Java-regex/RE2 portability constraints as the
    * PII patterns; both engines support group-indexed extract-all. */
  val UrlPattern = "https?://([A-Za-z0-9.-]+)[^\\s]*"

  /** Per-document URL profile against a domain blocklist: total URL
    * count, blocked-domain hits, and the keep verdict. Pure per-row
    * regex work — zero shuffles; the blocklist folds into the predicate
    * (production-sized blocklists swap in a broadcast join keyed on the
    * extracted domain, same plan shape as Decontaminate). */
  def urlProfile(text: Column, blockedDomains: Seq[String]): Seq[(String, Column)] = {
    val domains = regexp_extract_all(text, lit(UrlPattern), lit(1))
    val blocked = size(filter(domains, d => d.isInCollection(blockedDomains)))
    Seq(
      "n_urls" -> size(domains),
      "n_blocked" -> blocked,
      "url_keep" -> (blocked === 0))
  }

  /** Per-category match counts (pre-redaction). */
  def counts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailPattern)),
    "n_ips" -> regexp_count(regexp_replace(text, lit(EmailPattern), lit("[EMAIL]")),
      lit(Ipv4Pattern)),
    "n_phones" -> regexp_count(
      regexp_replace(
        regexp_replace(text, lit(EmailPattern), lit("[EMAIL]")),
        lit(Ipv4Pattern), lit("[IP]")),
      lit(PhonePattern)))
}
