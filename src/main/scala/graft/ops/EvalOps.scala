package graft.ops

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.core.Tables.orderedByAll
import graft.eval.{Guardrails, JudgeMetrics}

/** Guardrail / evaluation operator inventory (SURVEY §2.9):
  * email masking (G1/G2), field-accuracy evaluation joins (G3),
  * broadcast-map normalization (G4), and word-overlap similarity
  * (F10). Emails are synthesized deterministically from customer rows
  * (the testdata has no email column); the oracle constructs the same
  * strings and the same mask with plain SQL string ops.
  */
object EvalOps {

  /** Nation → currency-zone normalization map (G4 analog of the
    * reference's state-abbreviation map, baml_extract_eval.py:17-68).
    * Single source for the Spark literal map AND the oracle CASE.
    */
  private val zone = Seq(
    "UNITED STATES" -> "USD", "CANADA" -> "CAD", "BRAZIL" -> "BRL",
    "GERMANY" -> "EUR", "FRANCE" -> "EUR", "UNITED KINGDOM" -> "GBP",
    "JAPAN" -> "JPY", "CHINA" -> "CNY", "INDIA" -> "INR")

  val defs: Seq[QueryDef] = Seq(
    // E1 email detect + mask: the reference's structure-preserving
    // mask (first/last of user, first of each domain part) as a pure
    // Scala UDF, applied to text with an embedded synthesized email.
    QueryDef(
      "e1_email_mask",
      (s, d) => {
        val email = concat(
          lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", "")),
          lit("@"), lower(col("c_mktsegment")), lit(".com"))
        val text = concat(lit("contact "), email, lit(" asap"))
        orderedByAll(
          Tables.customer(s, d).select(
            col("c_custkey"),
            Guardrails.maskTextUdf(text).as("masked"),
            size(Guardrails.findEmailsCol(text)).as("n_emails")))
      },
      // username = 'customer' || 9 digits (len 17 > 2); domain parts:
      // segment (len>1) and 'com' — replicate the mask in SQL.
      Some("""SELECT c_custkey,
             |  'contact ' ||
             |  substring(u, 1, 1) || repeat('*', length(u) - 2) || substring(u, length(u), 1)
             |  || '@' || substring(seg, 1, 1) || repeat('*', length(seg) - 1) || '.c**'
             |  || ' asap' AS masked,
             |  1 AS n_emails
             |FROM (SELECT c_custkey,
             |        lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')) AS u,
             |        lower(c_mktsegment) AS seg
             |      FROM customer)
             |ORDER BY ALL""".stripMargin)
    ),
    // E2 field-accuracy eval join (G3): gold vs deterministically
    // perturbed "extraction", per-field comparators (strict /
    // case-insensitive), tallied to match counts + ratio.
    QueryDef(
      "e2_field_accuracy",
      (s, d) => {
        val gold = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        val extracted = Tables.customer(s, d).select(
          col("c_custkey"),
          when(col("c_custkey") % 7 === 0, upper(col("c_name")))
            .otherwise(col("c_name")).as("name_ex"),
          when(col("c_custkey") % 11 === 0, lit("UNKNOWN"))
            .otherwise(col("c_mktsegment")).as("seg_ex"))
        orderedByAll(
          gold.join(extracted, "c_custkey")
            .agg(
              sum(when(col("c_name") === col("name_ex"), 1L).otherwise(0L)).as("name_strict"),
              sum(when(lower(col("c_name")) === lower(col("name_ex")), 1L).otherwise(0L)).as("name_ci"),
              sum(when(col("c_mktsegment") === col("seg_ex"), 1L).otherwise(0L)).as("seg_strict"),
              count(lit(1)).as("n"))
            .withColumn("name_ci_acc", col("name_ci").cast("double") / col("n").cast("double")))
      },
      Some("""SELECT
             |  CAST(sum(CASE WHEN c_name = name_ex THEN 1 ELSE 0 END) AS BIGINT) AS name_strict,
             |  CAST(sum(CASE WHEN lower(c_name) = lower(name_ex) THEN 1 ELSE 0 END) AS BIGINT) AS name_ci,
             |  CAST(sum(CASE WHEN c_mktsegment = seg_ex THEN 1 ELSE 0 END) AS BIGINT) AS seg_strict,
             |  count(*) AS n,
             |  CAST(sum(CASE WHEN lower(c_name) = lower(name_ex) THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) AS name_ci_acc
             |FROM (
             |  SELECT g.c_custkey, g.c_name, g.c_mktsegment,
             |         CASE WHEN g.c_custkey % 7 = 0 THEN upper(g.c_name) ELSE g.c_name END AS name_ex,
             |         CASE WHEN g.c_custkey % 11 = 0 THEN 'UNKNOWN' ELSE g.c_mktsegment END AS seg_ex
             |  FROM customer g)
             |ORDER BY ALL""".stripMargin)
    ),
    // E3 word-set overlap similarity (F10, rag_obs_eval.py:330-333):
    // |tokens(a) ∩ tokens(b)| / max(|a|, |b|) over distinct lowercase
    // tokens, for a small doc-pair block.
    QueryDef(
      "e3_word_overlap",
      (s, d) => {
        val t = Tables.documents(s, d).filter(col("doc_id") < 20)
          .select(col("doc_id"),
            array_distinct(graft.text.TextFunctions.tokens(col("text"))).as("toks"))
        orderedByAll(
          t.as("a").join(t.as("b"), col("a.doc_id") < col("b.doc_id"))
            .select(
              col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
              (size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
                greatest(size(col("a.toks")), size(col("b.toks"))).cast("double")).as("overlap")))
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
             |  FROM documents WHERE doc_id < 20)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             |         / CAST(greatest(len(a.toks), len(b.toks)) AS DOUBLE) AS overlap
             |FROM t a JOIN t b ON a.doc_id < b.doc_id
             |ORDER BY ALL""".stripMargin)
    ),
    // E4 broadcast-map normalization (G4): literal map lookup with
    // fallback, then rollup — the state-abbrev→full-name pattern.
    QueryDef(
      "e4_map_normalize",
      (s, d) => {
        val m = map(zone.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
        orderedByAll(
          Tables.customer(s, d)
            .join(broadcast(Tables.nation(s, d)),
              col("c_nationkey") === col("n_nationkey"))
            .select(coalesce(element_at(m, col("n_name")), lit("OTHER")).as("ccy"))
            .groupBy("ccy").agg(count(lit(1)).as("n")))
      },
      Some {
        val cases = zone.map { case (k, v) => s"WHEN n_name = '$k' THEN '$v'" }
          .mkString(" ")
        s"""SELECT CASE $cases ELSE 'OTHER' END AS ccy, count(*) AS n
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY 1 ORDER BY ALL""".stripMargin
      }
    ),
    // E5 email-domain classification + policy verdict (G1,
    // guardrails.py:103-198): domains synthesized to hit every branch
    // — a free-mail domain (blockCommonDomains), a blocklisted one, an
    // allowlisted one, and an off-allowlist one — classified and
    // mapped to block/mask/allow by pure CASE/IN expressions.
    QueryDef(
      "e5_email_policy",
      (s, d) => {
        val policy = Guardrails.EmailPolicy(
          allowedDomains = Set("corp.example"),
          blockedDomains = Set("evil.example"),
          blockCommonDomains = true)
        val domains = array(lit("gmail.com"), lit("evil.example"),
          lit("corp.example"), lit("partner.example"))
        val email = concat(
          lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", "")),
          lit("@"), element_at(domains, (col("c_custkey") % 4 + 1).cast("int")))
        val dom = Guardrails.emailDomain(email)
        orderedByAll(
          Tables.customer(s, d).select(
            col("c_custkey"),
            dom.as("domain"),
            Guardrails.isCommon(dom).as("is_common"),
            Guardrails.isAllowed(dom, policy).as("is_allowed"),
            Guardrails.isBlocked(dom, policy).as("is_blocked"),
            Guardrails.verdict(dom, policy).as("verdict")))
      },
      Some {
        val common = Guardrails.CommonDomains.toSeq.sorted
          .map(dq => s"'$dq'").mkString(", ")
        s"""SELECT c_custkey, domain,
           |  domain IN ($common) AS is_common,
           |  domain = 'corp.example' AS is_allowed,
           |  domain = 'evil.example' AS is_blocked,
           |  CASE WHEN domain = 'evil.example' THEN 'block'
           |       WHEN domain IN ($common) THEN 'block'
           |       WHEN domain <> 'corp.example' THEN 'mask'
           |       ELSE 'allow' END AS verdict
           |FROM (SELECT c_custkey,
           |        CASE c_custkey % 4
           |          WHEN 0 THEN 'gmail.com' WHEN 1 THEN 'evil.example'
           |          WHEN 2 THEN 'corp.example' ELSE 'partner.example'
           |        END AS domain
           |      FROM customer)
           |ORDER BY ALL""".stripMargin
      }
    ),
    // E6 deterministic judge metrics (G6's engine-shaped slice): the
    // Opik Contains score (rag_obs_eval.py:256) and the golden-answer
    // number↔word variant matcher (test_graphrag.py:21-35), both pure
    // projections over synthesized answer/expected pairs that hit
    // every branch (digit hit, word-variant hit, substring hit, miss).
    QueryDef(
      "e6_judge_contains",
      (s, d) => {
        val expectedVals = Seq("three", "10", "seven", "0", "2")
        val expected = element_at(array(expectedVals.map(lit): _*),
          (col("doc_id") % 5 + 1).cast("int"))
        val answer = concat(lit("the count is "), (col("doc_id") % 12).cast("string"))
        orderedByAll(
          Tables.documents(s, d).select(
            col("doc_id"),
            expected.as("expected"),
            JudgeMetrics.containsScore(answer, expected).as("contains_score"),
            JudgeMetrics.matchesExpected(answer, expected).as("matched")))
      },
      Some {
        val w2n = JudgeMetrics.NumberWords.toMap
        val n2w = JudgeMetrics.NumberWords.map(_.swap).toMap
        def variants(v: String): Seq[String] =
          Seq(v) ++ w2n.get(v).orElse(n2w.get(v))
        val matchedCases = Seq("three", "10", "seven", "0", "2").map { v =>
          val conds = variants(v)
            .map(x => s"contains(answer, '$x')").mkString(" OR ")
          s"WHEN '$v' THEN ($conds)"
        }.mkString(" ")
        s"""WITH t AS (
           |  SELECT doc_id,
           |    CASE doc_id % 5 WHEN 0 THEN 'three' WHEN 1 THEN '10'
           |         WHEN 2 THEN 'seven' WHEN 3 THEN '0' ELSE '2' END AS expected,
           |    'the count is ' || CAST(doc_id % 12 AS VARCHAR) AS answer
           |  FROM documents)
           |SELECT doc_id, expected,
           |  CASE WHEN contains(lower(answer), lower(expected))
           |       THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS contains_score,
           |  CASE expected $matchedCases END AS matched
           |FROM t ORDER BY ALL""".stripMargin
      }
    ),
    // E7 multi-pattern PII scrub (training-data scrubbing beyond the
    // reference's email guardrail): phone + IPv4 detection counts and
    // placeholder masking over synthesized text — some rows carry a
    // phone, some an IP, some both, some neither, so every
    // detect/mask branch is exercised. Pure regexp builtins end to
    // end (detect = regexp_extract_all, mask = regexp_replace): the
    // whole query is one codegen'd projection, zero shuffles before
    // the presentation sort.
    QueryDef(
      "e7_pii_scrub",
      (s, d) => {
        val key = col("c_custkey")
        val phone = concat(
          lpad(((key * 7) % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(((key * 13) % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(((key * 31) % 10000).cast("string"), 4, "0"))
        val ip = concat(lit("10."), ((key * 3) % 256).cast("string"),
          lit(".0."), (key % 256).cast("string"))
        val text = concat(lit("note for "), col("c_name"),
          when(key % 3 === 0, concat(lit(" call "), phone)).otherwise(lit("")),
          when(key % 5 === 0, concat(lit(" ping "), ip)).otherwise(lit("")))
        orderedByAll(
          Tables.customer(s, d).select(
            col("c_custkey"),
            size(Guardrails.findPatternCol(text, Guardrails.PhoneRegex)).as("n_phones"),
            size(Guardrails.findPatternCol(text, Guardrails.Ipv4Regex)).as("n_ips"),
            Guardrails.scrubPattern(
              Guardrails.scrubPattern(text, Guardrails.PhoneRegex, "[PHONE]"),
              Guardrails.Ipv4Regex, "[IP]").as("scrubbed")))
      },
      Some("""WITH t AS (
             |  SELECT c_custkey,
             |    'note for ' || c_name ||
             |    CASE WHEN c_custkey % 3 = 0 THEN ' call ' ||
             |      lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' ||
             |      lpad(CAST((c_custkey * 13) % 1000 AS VARCHAR), 3, '0') || '-' ||
             |      lpad(CAST((c_custkey * 31) % 10000 AS VARCHAR), 4, '0')
             |    ELSE '' END ||
             |    CASE WHEN c_custkey % 5 = 0 THEN ' ping 10.' ||
             |      CAST((c_custkey * 3) % 256 AS VARCHAR) || '.0.' ||
             |      CAST(c_custkey % 256 AS VARCHAR)
             |    ELSE '' END AS text
             |  FROM customer)
             |SELECT c_custkey,
             |  len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phones,
             |  len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
             |  regexp_replace(
             |    regexp_replace(text, '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS scrubbed
             |FROM t ORDER BY ALL""".stripMargin)
    ),
    // E8 secrets scrub — the credential-removal stage of curation
    // (assignment-style `api_key=…` secrets and bare 32+-char hex
    // tokens), synthesized deterministically from customer rows like
    // e1/e7 (md5 gives a realistic 32-hex credential both engines
    // compute identically). Counts detect on the ORIGINAL text;
    // scrub collapses keyword+value to [SECRET] first, then bare hex
    // to [HEX]. One codegen'd projection, zero UDFs.
    QueryDef(
      "e8_secrets_scrub",
      (s, d) => {
        val key = col("c_custkey")
        val text = concat(
          lit("cfg api_key="), md5(col("c_name")),
          when(key % 2 === 0,
            concat(lit(" session "), md5(col("c_mktsegment")))).otherwise(lit("")),
          when(key % 7 === 0, lit(" password: hunter2")).otherwise(lit("")),
          lit(" ok"))
        orderedByAll(
          Tables.customer(s, d).select(
            col("c_custkey"),
            size(Guardrails.findPatternCol(
              text, Guardrails.KeyValueSecretRegex)).as("n_kv"),
            size(Guardrails.findPatternCol(
              text, Guardrails.HexTokenRegex)).as("n_hex"),
            Guardrails.scrubSecrets(text).as("scrubbed")))
      },
      Some("""WITH t AS (
             |  SELECT c_custkey,
             |    'cfg api_key=' || md5(c_name) ||
             |    CASE WHEN c_custkey % 2 = 0
             |      THEN ' session ' || md5(c_mktsegment) ELSE '' END ||
             |    CASE WHEN c_custkey % 7 = 0
             |      THEN ' password: hunter2' ELSE '' END ||
             |    ' ok' AS text
             |  FROM customer)
             |SELECT c_custkey,
             |  len(regexp_extract_all(text,
             |    '(?i)\b(api[_-]?key|secret|token|passwd|password)\s*[:=]\s*\S+')) AS n_kv,
             |  len(regexp_extract_all(text, '\b[0-9a-f]{32,}\b')) AS n_hex,
             |  regexp_replace(
             |    regexp_replace(text,
             |      '(?i)\b(api[_-]?key|secret|token|passwd|password)\s*[:=]\s*\S+',
             |      '[SECRET]', 'g'),
             |    '\b[0-9a-f]{32,}\b', '[HEX]', 'g') AS scrubbed
             |FROM t ORDER BY ALL""".stripMargin)
    )
  )
}
