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

  test("planted-PII property: 200 random documents, counts equal plants, clean text survives") {
    val rnd = new scala.util.Random(20260813L)
    def word(): String = Array.fill(2 + rnd.nextInt(8))(('a' + rnd.nextInt(26)).toChar).mkString
    def email(): String = s"${word()}.${word()}@${word()}.${word()}.com"
    def ip(): String = Seq.fill(4)(rnd.nextInt(256)).mkString(".")
    def phone(): String = f"${100 + rnd.nextInt(900)}%d-${rnd.nextInt(10000)}%04d"
    val cases = (1 to 200).map { i =>
      val nE = rnd.nextInt(4); val nI = rnd.nextInt(4); val nP = rnd.nextInt(4)
      val pieces = scala.util.Random.javaRandomToRandom(new java.util.Random(i))
        .shuffle(Seq.fill(nE)(email()) ++ Seq.fill(nI)(ip()) ++ Seq.fill(nP)(phone()) ++
          Seq.fill(5 + rnd.nextInt(10))(word()))
      (i.toLong, pieces.mkString(" "), nE, nI, nP)
    }
    val got = cases.map { case (id, t, _, _, _) => (id, t) }
      .toDF("id", "t")
      .select($"id",
        Redaction.emailCount($"t"), Redaction.ipv4Count($"t"), Redaction.phoneCount($"t"),
        Redaction.redactPii($"t"))
      .as[(Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    cases.foreach { case (id, _, nE, nI, nP) =>
      val (gE, gI, gP, red) = got(id)
      assert((gE, gI, gP) == ((nE, nI, nP)),
        s"case $id: planted ($nE,$nI,$nP) counted ($gE,$gI,$gP)")
      assert(!red.contains("@") && !"\\b[0-9]{1,3}\\.[0-9]".r.findFirstIn(red).isDefined,
        s"case $id: PII survived redaction: $red")
    }
  }
}
