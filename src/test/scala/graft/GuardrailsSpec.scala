package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.eval.Guardrails

class GuardrailsSpec extends AnyFunSuite {

  /** Deterministic sampling (fixed seed) from a scalacheck Gen. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("maskEmail known answers (reference guardrails.py:200-237 semantics)") {
    assert(Guardrails.maskEmail("john.doe@gmail.com") === "j******e@g****.c**")
    assert(Guardrails.maskEmail("ab@x.io") === "**@x.i*")
    assert(Guardrails.maskEmail("a@b.co") === "*@b.c*")
    assert(Guardrails.maskEmail("Jon665.Keeling57@example.com") === "J**************7@e******.c**")
  }

  test("maskText masks every occurrence, preserves surrounding text") {
    val in = "mail a@bc.de then cc team.lead@corp.example.org today"
    val out = Guardrails.maskText(in)
    assert(out === "mail *@b*.d* then cc t*******d@c***.e******.o** today")
  }

  test("maskText without emails is identity; null is null") {
    assert(Guardrails.maskText("no emails here") === "no emails here")
    assert(Guardrails.maskText(null) === null)
  }

  test("findEmails extracts with the reference regex") {
    assert(Guardrails.findEmails("x a.b@c.org y z@z") === Seq("a.b@c.org"))
    assert(Guardrails.findEmails(null) === Seq.empty)
  }

  test("MaskEmails expression matches maskText row by row and codegens") {
    import TestSession.spark.implicits._
    import org.apache.spark.sql.functions.col
    // adversarial shapes: multiple emails, unicode around them, short
    // users/parts, no-email, empty, plus the property-gen corpus
    val gen = for {
      u <- Gen.alphaNumStr.suchThat(s => s.nonEmpty && s.length < 20)
      d <- Gen.alphaLowerStr.suchThat(s => s.length >= 2 && s.length < 12)
      tld <- Gen.oneOf("com", "org", "io")
      pre <- Gen.oneOf("", "héllo ", "a@b ", "x.y@z ")
    } yield s"$pre$u@$d.$tld bye c@d.ef"
    val cases = samples(gen, 120) ++ Seq(
      "no emails here", "", "a@bc.de", "ab@x.io tail",
      "αβγ a.b@c.org δε", "two a@bb.cc b@cc.dd")
    // repartition blocks ConvertToLocalRelation from folding the
    // whole projection driver-side — the plan must show the real
    // executor-side shape
    val df = cases.toDF("text").repartition(2)
      .select(col("text"), Guardrails.maskTextUdf(col("text")).as("masked"))
    // identical semantics to the Scala reference implementation
    // (collect on THIS Dataset so its AQE plan finalizes for the
    // plan assertions below)
    for (r <- df.collect())
      assert(r.getString(1) === Guardrails.maskText(r.getString(0)),
        s"diverged for: ${r.getString(0)}")
    // and the plan is a codegen'd native-expression projection — the
    // expression prints under its prettyName, not as an optimizer-
    // opaque ScalaUDF (the round-11 zero-UDF contract)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("mask_emails("), s"native expression expected:\n$plan")
    assert(!plan.contains("UDF"), s"mask must not be a UDF:\n$plan")
    // the `*(n)` stage marker is WholeStageCodegen in AQE's plan print
    assert(plan.contains("*(1) Project"), s"mask must stay in codegen:\n$plan")
  }

  test("masking is idempotent (masked text re-masks to itself)") {
    val gen = for {
      u <- Gen.alphaNumStr.suchThat(s => s.nonEmpty && s.length < 20)
      d <- Gen.alphaLowerStr.suchThat(s => s.length >= 2 && s.length < 12)
      tld <- Gen.oneOf("com", "org", "io")
    } yield s"hello $u@$d.$tld bye"
    val cases = samples(gen, 100)
    assert(cases.nonEmpty)
    for (text <- cases) {
      val once = Guardrails.maskText(text)
      assert(Guardrails.maskText(once) === once, s"not idempotent for: $text")
    }
  }

  test("email policy verdicts cover every branch (guardrails.py:103-198)") {
    import TestSession.spark.implicits._
    import org.apache.spark.sql.functions.col
    val policy = Guardrails.EmailPolicy(
      allowedDomains = Set("corp.example"),
      blockedDomains = Set("evil.example"),
      blockCommonDomains = true)
    val df = Seq(
      "a@GMAIL.com",       // common (case-folded) + blockCommon → block
      "b@evil.example",    // blocklisted → block
      "c@corp.example",    // allowlisted → allow
      "d@partner.example"  // off-allowlist → mask
    ).toDF("email")
    val dom = Guardrails.emailDomain(col("email"))
    val got = df.select(col("email"), Guardrails.verdict(dom, policy).as("v"))
      .as[(String, String)].collect().toMap
    assert(got("a@GMAIL.com") === "block")
    assert(got("b@evil.example") === "block")
    assert(got("c@corp.example") === "allow")
    assert(got("d@partner.example") === "mask")
  }

  test("no allowlist means every domain is allowed; empty policy allows all") {
    import TestSession.spark.implicits._
    import org.apache.spark.sql.functions.col
    val dom = Guardrails.emailDomain(col("email"))
    val df = Seq("x@anywhere.net", "y@gmail.com").toDF("email")
    val open = df.select(col("email"),
      Guardrails.verdict(dom, Guardrails.EmailPolicy()).as("v"))
      .as[(String, String)].collect().toMap
    assert(open.values.forall(_ == "allow"),
      "default policy (no lists, no common-block) must allow everything")
  }

  test("emailDomain: first-@ segment (reference split), NULL without '@'") {
    import TestSession.spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq("a@gmail.com", "user@gmail.com@evil.example", "no-at-here")
      .toDF("email")
      .select(col("email"), Guardrails.emailDomain(col("email")).as("d"))
      .as[(String, Option[String])].collect().toMap
    assert(got("a@gmail.com") === Some("gmail.com"))
    assert(got("user@gmail.com@evil.example") === Some("gmail.com"),
      "multi-@ must classify by the FIRST-split segment like the reference")
    assert(got("no-at-here") === None, "malformed input falls out of the cascade")
  }

  test("findEmailsCol matches the UDF semantics on NULL text (empty, not null)") {
    import TestSession.spark.implicits._
    import org.apache.spark.sql.functions.{col, size}
    val n = Seq(Option("contact a@b.co"), None).toDF("text")
      .select(size(Guardrails.findEmailsCol(col("text"))).as("n"))
      .as[Int].collect().toSeq.sorted
    assert(n === Seq(0, 1), "NULL text counts 0 emails, like findEmails(null)")
  }

  test("mask preserves structure: length, @ position, domain dots") {
    // dots INSIDE the username are masked to '*' (reference keeps only
    // first/last user chars); domain dots survive the per-part mask.
    for (e <- Seq("abc.def@mail.example.com", "xy@a.bc", "a_b%c@do-main.org")) {
      val m = Guardrails.maskEmail(e)
      assert(m.length === e.length)
      assert(m.indexOf('@') === e.indexOf('@'))
      assert(m.split("@")(1).count(_ == '.') === e.split("@")(1).count(_ == '.'))
    }
  }

  test("PII scrub: phone and IPv4 detect + placeholder-mask, word-bounded") {
    import TestSession.spark.implicits._
    import org.apache.spark.sql.functions.{col, size}
    val rows = Seq(
      "call 555-123-4567 or 555-999-0000 now",     // two phones
      "host 10.0.0.1 and 192.168.1.254 up",        // two IPs
      "mixed 555-123-4567 at 10.0.0.1",            // one of each
      "order 1234-567-8901 shipped",               // 4-digit prefix: \b blocks the match
      "version 1.2.3 of 10.0.0.1.5 rests",         // 1.2.3 too short; 10.0.0.1.5 matches its first four octets
      "clean text, no pii"
    ).toDF("text")
    val got = rows.select(
        size(Guardrails.findPatternCol(col("text"), Guardrails.PhoneRegex)).as("np"),
        size(Guardrails.findPatternCol(col("text"), Guardrails.Ipv4Regex)).as("ni"),
        Guardrails.scrubPattern(
          Guardrails.scrubPattern(col("text"), Guardrails.PhoneRegex, "[PHONE]"),
          Guardrails.Ipv4Regex, "[IP]").as("s"))
      .as[(Int, Int, String)].collect().toSeq
    assert(got(0) === ((2, 0, "call [PHONE] or [PHONE] now")))
    assert(got(1) === ((0, 2, "host [IP] and [IP] up")))
    assert(got(2) === ((1, 1, "mixed [PHONE] at [IP]")))
    assert(got(3)._1 === 0, "digits beyond the group bound must not match")
    assert(got(4) === ((0, 1, "version 1.2.3 of [IP].5 rests")),
      "a 5-dotted run matches its first four octets — regex-level detection's documented limit")
    assert(got(5) === ((0, 0, "clean text, no pii")))
  }

  test("secrets scrub: assignment secrets, bare hex tokens, case/keyword bounds") {
    import TestSession.spark.implicits._
    import org.apache.spark.sql.functions.{col, size}
    val hex32 = "a" * 16 + "0123456789abcdef"
    val rows = Seq(
      s"API_KEY=$hex32 deployed",              // keyword+value → one [SECRET]; hex consumed with it
      s"checksum $hex32 stored",               // bare hex → [HEX]
      "password: hunter2 set",                 // short value still a secret
      "api key = x",                           // space in keyword: no [:=] adjacency — no match
      "the token economy",                     // keyword without assignment — no match
      "ABCDEF0123456789ABCDEF0123456789 up"    // UPPER hex: HexTokenRegex is lowercase-only by design
    ).toDF("text")
    val got = rows.select(
        size(Guardrails.findPatternCol(col("text"), Guardrails.KeyValueSecretRegex)).as("nk"),
        size(Guardrails.findPatternCol(col("text"), Guardrails.HexTokenRegex)).as("nh"),
        Guardrails.scrubSecrets(col("text")).as("s"))
      .as[(Int, Int, String)].collect().toSeq
    assert(got(0) === ((1, 1, "[SECRET] deployed")))
    assert(got(1) === ((0, 1, "checksum [HEX] stored")))
    assert(got(2) === ((1, 0, "[SECRET] set")))
    assert(got(3) === ((0, 0, "api key = x")))
    assert(got(4) === ((0, 0, "the token economy")))
    assert(got(5) === ((0, 0, "ABCDEF0123456789ABCDEF0123456789 up")),
      "uppercase hex is out of scope by design (md5/sha output is lowercase)")
  }
}
