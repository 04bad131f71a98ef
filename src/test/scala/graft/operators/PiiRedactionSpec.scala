package graft.operators

import graft.SparkSpec

/** Unit edges for the PII scrub (the bulk behavior is oracle-checked by
  * q71): pattern ordering and non-PII preservation. */
class PiiRedactionSpec extends SparkSpec {

  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.redactPii($"t")).head().getString(0)

  test("emails, phones, IPs redact to placeholders") {
    assert(redact("mail a.b+c@sub.example.org now") === "mail <EMAIL> now")
    assert(redact("call 555-123-4567 or 555.123.4567") === "call <PHONE> or <PHONE>")
    assert(redact("host 192.168.1.254 up") === "host <IP> up")
  }

  test("a dotted phone is a PHONE, not half an IP (pattern order)") {
    assert(redact("x 555.123.4567 y") === "x <PHONE> y")
  }

  test("plain text, bare numbers, and versions survive untouched") {
    assert(redact("release 1.2.3 of the 4000 series") === "release 1.2.3 of the 4000 series")
    assert(redact("price 123-4567") === "price 123-4567")
  }
}
