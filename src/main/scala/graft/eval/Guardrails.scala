package graft.eval

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Guardrail functions (reference src/guardrails.py): email detection,
  * domain classification, and structure-preserving masking.
  *
  * The mask is a pure Scala function wrapped as a UDF — per SURVEY
  * §2.11 it is one of only two UDFs in the engine (everything else is
  * codegen'd Catalyst expressions); it runs per-row with no state so
  * it scales embarrassingly.
  */
object Guardrails {

  /** Reference email_pattern (guardrails.py:93-95). The `[A-Z|a-z]`
    * TLD class (including the literal '|') is replicated as-is.
    */
  val EmailRegex = """\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b""".r

  /** Common free-mail domains (guardrails.py:99-102). */
  val CommonDomains: Set[String] = Set(
    "gmail.com", "yahoo.com", "hotmail.com", "outlook.com",
    "aol.com", "icloud.com", "protonmail.com", "mail.com")

  def findEmails(text: String): Seq[String] =
    if (text == null) Seq.empty else EmailRegex.findAllIn(text).toSeq

  /** Mask one email (guardrails.py:200-237): username keeps first and
    * last char (≤2 chars ⇒ fully masked); each domain part keeps its
    * first char (≤1 char parts unchanged).
    */
  def maskEmail(email: String, maskChar: Char = '*'): String = {
    val Array(user, domain) = email.split("@", 2)
    val mu =
      if (user.length <= 2) maskChar.toString * user.length
      else s"${user.head}${maskChar.toString * (user.length - 2)}${user.last}"
    val md = domain.split("\\.", -1).map { p =>
      if (p.length <= 1) p else s"${p.head}${maskChar.toString * (p.length - 1)}"
    }.mkString(".")
    s"$mu@$md"
  }

  /** Mask every email occurrence inside free text. */
  def maskText(text: String): String =
    if (text == null) null
    else EmailRegex.replaceAllIn(text, m => java.util.regex.Matcher.quoteReplacement(maskEmail(m.matched)))

  /** Column form of the mask — since round 11 a native codegen'd
    * Catalyst expression ([[graft.functions.MaskEmails]]), replacing
    * the engine's last UDF: the structure-preserving rewrite has no
    * builtin equivalent, but it doesn't need to be an optimizer-opaque
    * black box either. Same semantics as [[maskText]] (GuardrailsSpec
    * cross-checks row by row).
    */
  val maskTextUdf: Column => Column = c =>
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.MaskEmails(
        org.apache.spark.sql.GraftExpressionBridge.expression(c)))

  /** Email DETECTION as the codegen'd builtin (SURVEY §2.9 G1's
    * stated mapping): `regexp_extract_all` over the same reference
    * pattern. Scala's Regex and Spark's regexp_* share Java regex
    * syntax, so matches are identical to [[findEmails]] — only the
    * mask needs a UDF.
    */
  def findEmailsCol(text: Column): Column =
    findPatternCol(text, EmailRegex.regex)

  // ---- generic PII patterns beyond email (training-data scrubbing)

  /** Phone / IPv4 patterns for corpus PII scrubbing. Detection is the
    * codegen'd `regexp_extract_all` builtin (the same §2.9 G1 mapping
    * as email detection) and the mask is a plain `regexp_replace` to
    * a fixed placeholder token — no UDF anywhere on this path, unlike
    * the email mask, whose structure-preserving rewrite has no
    * builtin equivalent. Patterns stay inside the subset shared by
    * Java regex and RE2 (`\b`, bounded `{m,n}` repetition, literal
    * classes) so the DuckDB oracle replays them verbatim.
    */
  val PhoneRegex: String = """\b\d{3}-\d{3}-\d{4}\b"""
  val Ipv4Regex: String = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** Credential-shaped content — the secrets-scrubbing stage of
    * training-data curation (a corpus must not teach a model real
    * keys). Two portable patterns (Java regex ∩ RE2, like every
    * pattern here, so oracle engines replay them verbatim):
    * `KeyValueSecretRegex` matches assignment-style secrets
    * (`api_key=…`, `password: …` — the sensitive KEYWORD plus its
    * value through the next whitespace), `HexTokenRegex` matches bare
    * long-hex material (32+ hex chars — md5/sha/session tokens).
    */
  val KeyValueSecretRegex: String =
    """(?i)\b(api[_-]?key|secret|token|passwd|password)\s*[:=]\s*\S+"""
  val HexTokenRegex: String = """\b[0-9a-f]{32,}\b"""

  /** Scrub both secret shapes: assignment-style first (so the keyword
    * and its value collapse to one [SECRET]), then any remaining bare
    * hex tokens → [HEX]. One codegen'd projection, no UDF — the e7
    * discipline.
    */
  def scrubSecrets(text: Column): Column =
    scrubPattern(
      scrubPattern(text, KeyValueSecretRegex, "[SECRET]"),
      HexTokenRegex, "[HEX]")

  /** All matches of `regex` in `text` (empty array, never null). */
  def findPatternCol(text: Column, regex: String): Column =
    coalesce(regexp_extract_all(text, lit(regex), lit(0)),
      array().cast("array<string>"))

  /** Replace every `regex` match with a fixed placeholder token.
    * The token is literal: '$' and '\' are escaped so Spark's
    * replacement string never interprets them as group references.
    */
  def scrubPattern(text: Column, regex: String, token: String): Column =
    regexp_replace(text, regex, java.util.regex.Matcher.quoteReplacement(token))

  // ---- domain classification / policy verdicts (guardrails.py:103-198)

  /** Guardrail configuration (EmailGuardrail ctor args,
    * guardrails.py:60-88): an optional allowlist, an optional
    * blocklist, and whether free-mail (common) domains trigger.
    */
  final case class EmailPolicy(
      allowedDomains: Set[String] = Set.empty,
      blockedDomains: Set[String] = Set.empty,
      blockCommonDomains: Boolean = false)

  /** Lower-cased domain of an email — `email.split('@')[1].lower()`
    * (guardrails.py:142). Pure codegen'd string ops, no UDF.
    * NULL when the input has no '@' (the reference's split('@')[1]
    * raises instead — malformed values must fall OUT of the policy
    * cascade, not into it). Segment AFTER THE FIRST '@', exactly like
    * split('@')[1] — a multi-'@' value must classify by the same
    * segment as the reference, not by the last one.
    */
  def emailDomain(email: Column): Column =
    when(email.contains("@"), lower(element_at(split(email, "@"), 2)))

  /** The three per-email classification flags (guardrails.py:143-145):
    * is_common (free-mail), is_allowed (vacuously true with no
    * allowlist), is_blocked.
    */
  def isCommon(domain: Column): Column =
    domain.isin(CommonDomains.toSeq.sorted: _*)
  def isAllowed(domain: Column, p: EmailPolicy): Column =
    if (p.allowedDomains.isEmpty) lit(true)
    else domain.isin(p.allowedDomains.toSeq.sorted: _*)
  def isBlocked(domain: Column, p: EmailPolicy): Column =
    if (p.blockedDomains.isEmpty) lit(false)
    else domain.isin(p.blockedDomains.toSeq.sorted: _*)

  /** Per-email policy verdict, the trigger cascade of
    * guardrails.py:160-178 collapsed to a decision column:
    * blocklisted or (configured) free-mail domains → 'block';
    * off-allowlist (when an allowlist exists) → 'mask' (the
    * structure-preserving mask is the reference's non-block
    * remediation); otherwise → 'allow'. A plain CASE expression —
    * whole-stage codegen, trivially pushed past joins.
    * NULL domain (malformed email) ⇒ NULL verdict — it falls out of
    * the cascade entirely rather than defaulting to 'allow'.
    */
  def verdict(domain: Column, p: EmailPolicy): Column =
    when(domain.isNotNull,
      when(isBlocked(domain, p), "block")
        .when(lit(p.blockCommonDomains) && isCommon(domain), "block")
        .when(!isAllowed(domain, p), "mask")
        .otherwise("allow"))
}
