package graft

import org.apache.spark.sql.functions._

import graft.text.Redaction

/** Pins the PII-redaction kernel: each category's pattern, the fixed
  * email -> ip -> phone application order (emails contain dotted
  * digits an IP pattern could bite into), and the count battery.
  */
class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Redaction.redactPii($"t")).as[String].head()

  private def counts(s: String): (Int, Int, Int) =
    Seq(s).toDF("t")
      .select(Redaction.emailCount($"t"), Redaction.ipv4Count($"t"), Redaction.phoneCount($"t"))
      .as[(Int, Int, Int)].head()

  test("each category redacts alone") {
    assert(redact("mail bob.smith+x@sub.example.org now") == "mail <EMAIL> now")
    assert(redact("host 192.168.0.7 up") == "host <IP> up")
    assert(redact("call 555-0142 today") == "call <PHONE> today")
  }

  test("an email's dotted-digit domain is redacted as EMAIL, never IP or PHONE") {
    // domain is itself a syntactic dotted quad + the local part ends
    // in digits: the email pattern must consume the whole address
    // before the ip/phone patterns ever see it
    assert(redact("x99@10.0.0.1.example.com") == "<EMAIL>")
    assert(counts("x99@10.0.0.1.example.com") == (1, 1, 0)) // counts overlap by design (raw text)
  }

  test("multiple matches all redact; clean text is untouched") {
    assert(redact("a@b.co c@d.io 1.2.3.4 5.6.7.8 555-1111 555-2222") ==
      "<EMAIL> <EMAIL> <IP> <IP> <PHONE> <PHONE>")
    val clean = "the quick brown fox 42 times over v1.2 at 555 dash"
    assert(redact(clean) == clean)
  }

  test("word boundaries hold: longer digit runs are not phones/IPs") {
    assert(redact("serial 1234-5678 ok") == "serial 1234-5678 ok")   // {3}-{4} bounded
    assert(redact("ver 1.2.3.4.5 ok") == s"ver ${"<IP>"}.5 ok")      // quad prefix matches, \b at dot
    assert(counts("serial 1234-5678 ok") == (0, 0, 0))
  }

  test("counts match redaction opportunities per category") {
    assert(counts("a@b.co 1.2.3.4 555-0000 and c@d.io") == (2, 1, 1))
  }
}
