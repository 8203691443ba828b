package graft

import org.apache.spark.sql.functions._

import graft.operators.PiiRedaction

class PiiRedactionSpec extends SparkSpec {
  import spark.implicits._

  test("scrub redacts every class and counts matches per class") {
    val df = Seq(
      (1L, "mail me at jo.doe+spam@sub.example.co.uk or jo@ex.io today"),
      (2L, "ssn 123-45-6789 phone 555-1234 ip 10.0.255.3"),
      (3L, "no pii here, just 12345 and a-b-c and x@y (not an email tld)"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = PiiRedaction.scrub(df, "text")
      .select("doc_id", "redacted", "n_email", "n_ssn", "n_phone", "n_ipv4")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(1L) == (("mail me at [EMAIL] or [EMAIL] today", 2L, 0L, 0L, 0L)))
    assert(got(2L) == (("ssn [SSN] phone [PHONE] ip [IP]", 0L, 1L, 1L, 1L)))
    // "x@y" has no dot-tld, "a-b-c"/"12345" match no class
    assert(got(3L) == (("no pii here, just 12345 and a-b-c and x@y (not an email tld)",
      0L, 0L, 0L, 0L)))
    assert(got(4L) == (("", 0L, 0L, 0L, 0L)))
  }

  test("ssn consumed before phone: tail digits never double-redact") {
    val df = Seq((1L, "id 123-45-6789 then 555-0000")).toDF("doc_id", "text")
    val r = PiiRedaction.scrub(df, "text").select("redacted", "n_ssn", "n_phone")
      .collect().head
    assert(r.getString(0) == "id [SSN] then [PHONE]")
    assert((r.getLong(1), r.getLong(2)) == ((1L, 1L)))
  }

  test("redaction is idempotent: tokens match no class pattern") {
    val df = Seq((1L, "a@b.com 123-45-6789 555-9999 1.2.3.4")).toDF("doc_id", "text")
    val once = PiiRedaction.scrub(df, "text").select(col("doc_id"), col("redacted").as("text"))
    val twice = PiiRedaction.scrub(once, "text")
      .select("redacted", "n_email", "n_ssn", "n_phone", "n_ipv4").collect().head
    assert(twice.getString(0) == "[EMAIL] [SSN] [PHONE] [IP]")
    assert((1 to 4).map(twice.getLong(_)).forall(_ == 0L))
  }
}
