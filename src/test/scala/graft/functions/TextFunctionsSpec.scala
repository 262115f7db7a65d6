package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  /** Independent restatement of the oracle's per-character fold:
    * DuckDB `list_reduce` over `ord(substr(text, i, 1))` — i.e.
    * Unicode code points, not UTF-8 bytes.
    */
  private def oracleFingerprint(text: String): Long = {
    var h = 0L
    text.codePoints().forEach(cp => h = (h * 31L + cp) % 2147483647L)
    h
  }

  test("fingerprint matches the code-point oracle fold on non-ASCII text") {
    val texts = Seq(
      "hello world",
      "héllo wörld",               // 2-byte UTF-8 chars: byte-fold would diverge
      "日本語のテキスト",              // 3-byte UTF-8 chars
      "emoji 😀 pair",   // surrogate pair (4-byte codepoint 0x1F600)
      "")
    val got = texts.toDF("text")
      .select(TextFunctions.fingerprint($"text").as("fp"))
      .as[Long].collect().toSeq
    assert(got == texts.map(oracleFingerprint),
      s"fingerprints diverge: got=$got expected=${texts.map(oracleFingerprint)}")
  }

  test("SQL surface: graft_fingerprint / graft_dot / tier_bucket via spark.sql") {
    GraftFunctions.register(spark)
    Seq(("héllo wörld", Array(1.0, 2.0), Array(3.0, 4.0)))
      .toDF("text", "a", "b").createOrReplaceTempView("gf_test")
    val row = spark.sql(
      """SELECT graft_fingerprint(text) AS fp,
        |  graft_dot(a, b) AS d,
        |  date_format(tier_bucket(TIMESTAMP '2024-01-01 10:31:22', '1h'),
        |    'yyyy-MM-dd HH:mm:ss') AS b1h
        |FROM gf_test""".stripMargin).head()
    assert(row.getLong(0) == oracleFingerprint("héllo wörld"))
    assert(row.getDouble(1) == 11.0)
    assert(row.getString(2) == "2024-01-01 10:00:00")
  }

  test("fingerprint is order-sensitive and stable") {
    val fps = Seq("ab", "ba", "ab").toDF("text")
      .select(TextFunctions.fingerprint($"text").as("fp"))
      .as[Long].collect()
    assert(fps(0) != fps(1))
    assert(fps(0) == fps(2))
  }
}
