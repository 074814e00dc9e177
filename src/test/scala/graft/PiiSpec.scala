package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins text_pii_scan's match and redaction behavior on planted PII —
  * the driver oracle grades it on real testdata, where most counters
  * are zero; this fixture proves the patterns actually fire. */
class PiiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("planted emails/phones/IPs/long numbers are counted and masked") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact john.doe@example.com or 555-123-4567 today"),
      (2L, "server 192.168.0.1 ticket 12345678 ok"),
      (3L, "plain text with no sensitive content at all"),
      (4L, "two mails a@b.co and c.d@e-f.org plus 10.0.0.255"))
      .toDF("doc_id", "text")
    val dir = s"/tmp/graft_pii_fixture_${suiteName.hashCode}"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_pii_scan")(spark, dir)
      .select("doc_id", "n_emails", "n_phones", "n_ips", "n_longnums", "redacted_len")
      .as[(Long, Int, Int, Int, Int, Int)].collect().sortBy(_._1).toSeq
    val expected = Seq(
      // "<EMAIL>"(7) + "<PHONE>"(7) replace 20- and 12-char matches
      (1L, 1, 1, 0, 0, "contact <EMAIL> or <PHONE> today".length),
      (2L, 0, 0, 1, 1, "server <IP> ticket 12345678 ok".length),
      (3L, 0, 0, 0, 0, "plain text with no sensitive content at all".length),
      (4L, 2, 0, 1, 0, "two mails <EMAIL> and <EMAIL> plus <IP>".length))
    assert(got == expected, s"pii scan rows: $got")
  }
}
