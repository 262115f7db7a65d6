package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSuite {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.redactPii(col("t"))).as[String].head()

  private def counts(s: String): Map[String, Long] =
    Seq(s).toDF("t")
      .select(TextFunctions.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().head.getValuesMap[Long](TextFunctions.piiPatterns.map(p => s"pii_${p._1}"))

  test("each category redacts to its token") {
    assert(redact("mail me at jo.doe+x@sub.example.co today") ===
      "mail me at <EMAIL> today")
    assert(redact("call 202-555-0142 now") === "call <PHONE> now")
    assert(redact("ssn 987-65-4320.") === "ssn <SSN>.")
    assert(redact("card 4111-1111-1111-1234 ok") === "card <CC> ok")
    assert(redact("from 10.0.42.17 port 80") === "from <IP> port 80")
  }

  test("specific digit shapes win over the looser phone shape") {
    // an SSN is NOT half-eaten as a phone prefix
    assert(redact("987-65-4320") === "<SSN>")
    // a 16-digit card is NOT carved into phone fragments
    assert(redact("4111 1111 1111 1234") === "<CC>")
  }

  test("counts audit the original text per category") {
    val c = counts("a@b.io and c@d.net, tel 202-555-0142, ip 1.2.3.4")
    assert(c("pii_email") === 2)
    assert(c("pii_phone") === 1)
    assert(c("pii_ip") === 1)
    assert(c("pii_ssn") === 0)
    assert(c("pii_cc") === 0)
  }

  test("lookalike non-PII survives") {
    val benign = "v1.2.3 released 2026-08-17 at 12:30, cost 1,234.56"
    assert(redact(benign) === benign)
    assert(counts(benign).values.sum === 0)
  }

  test("multiple hits in one row all redact") {
    assert(redact("a@b.io then c@d.net") === "<EMAIL> then <EMAIL>")
  }
}
