package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class LogTemplatesSpec extends SparkSuite {
  import spark.implicits._

  private val lines = Seq(
    (1L, "connection from 10 failed after 250 ms"),
    (2L, "connection from 99 failed after 3 ms"),
    (3L, "request 550e8400-e29b-41d4-a716-446655440000 returned 0x1F4"),
    (4L, "request 123e4567-e89b-42d3-a456-556642440000 returned 0xC8"),
    (5L, "heartbeat ok"),
    (6L, "scaled to 1.5 replicas")
  ).toDF("line_id", "text")

  test("same-shape lines share a template and event_id; params carry the diff") {
    val got = LogTemplates.mine(lines, "text")
      .select($"line_id", $"template", $"event_id", $"params")
      .as[(Long, String, Long, Seq[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == "connection from <VAR> failed after <VAR> ms")
    assert(got(1L)._2 == got(2L)._2 && got(1L)._3 == got(2L)._3)
    assert(got(1L)._4 == Seq("10", "250") && got(2L)._4 == Seq("99", "3"))
    // uuid masked as ONE variable (not digit fragments), hex as one
    assert(got(3L)._2 == "request <VAR> returned <VAR>")
    assert(got(3L)._4 == Seq("550e8400-e29b-41d4-a716-446655440000", "0x1F4"))
    assert(got(3L)._3 == got(4L)._3, "uuid/hex variants must share an event id")
    // constant-only line: template == text, no params
    assert(got(5L)._2 == "heartbeat ok" && got(5L)._4.isEmpty)
    // decimals are one variable
    assert(got(6L)._4 == Seq("1.5"))
  }

  test("template counts aggregate the mined vocabulary") {
    val got = LogTemplates.templateCounts(lines, "text")
      .select($"template", $"line_cnt", $"param_cnt")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("connection from <VAR> failed after <VAR> ms") == ((2L, 4L)))
    assert(got("request <VAR> returned <VAR>") == ((2L, 4L)))
    assert(got("heartbeat ok") == ((1L, 0L)))
    assert(got.size == 4)
  }

  test("masking and extraction use ONE pattern: rebuild(line) == template ∘ params") {
    // splice params back into the template — must reproduce the line
    val chk = LogTemplates.mine(lines, "text")
      .select($"text", $"template", $"params")
      .as[(String, String, Seq[String])].collect()
    chk.foreach { case (text, template, params) =>
      val rebuilt = params.foldLeft(template)((t, p) =>
        t.replaceFirst(java.util.regex.Pattern.quote("<VAR>"),
          java.util.regex.Matcher.quoteReplacement(p)))
      assert(rebuilt == text, s"template/params disagree for: $text")
    }
  }

  test("literal <VAR> in constant text: escape makes reconstruct exact") {
    // the r3-documented lossy case, now closed: bare <VAR> in a
    // template always means a masked variable; pre-existing tokens
    // are escaped (one added backslash per level) and restored
    val tricky = Seq(
      "tag <VAR> literal with id 42",          // literal mask + real var
      "already escaped <\\VAR> then 0xff",     // pre-escaped token
      "<VAR><VAR> back to back 7",             // adjacent literals
      "plain line no vars",
      "just 123")
      .toDF("text")
    val mined = LogTemplates.mine(tricky, "text")
    val chk = mined.select($"text",
        LogTemplates.reconstruct($"template", $"params").as("rebuilt"))
      .as[(String, String)].collect()
    chk.foreach { case (text, rebuilt) =>
      assert(rebuilt == text, s"reconstruct not exact for: $text")
    }
    // and the literal tokens never collide with a masked variable:
    // "tag <VAR> literal with id 42" has exactly ONE param (42)
    val row = mined.filter($"text".startsWith("tag "))
      .select($"template", $"params").as[(String, Seq[String])].head()
    assert(row._1 == "tag <\\VAR> literal with id <VAR>", row._1)
    assert(row._2 == Seq("42"), row._2.toString)
  }

  test("raw .log file → structured shape (the reference's AEL stage end-to-end)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rawlog-")
    val logFile = dir.resolve("ts-checkout-service.log")
    java.nio.file.Files.writeString(logFile,
      """2024-01-01 09:15:00.123 INFO 1---[main] c.e.Checkout: order 42 accepted in 15 ms
        |2024-01-01 09:15:01.456 INFO 1---[main] c.e.Checkout: order 43 accepted in 9 ms
        |2024-01-01 09:15:02.789 WARN 2---[pool] c.e.Checkout: retry 0xFF for order 43
        |this line does not parse
        |""".stripMargin)
    val got = graft.sources.ReferenceShapes.parseRawLogs(
      spark, logFile.toString, "checkout", hourOffset = -2)
    assert(got.columns.toSeq == Seq("Level", "EventId", "EventTemplate",
      "Content", "source_servicename", "original_timestamp"))
    val rows = got.orderBy("original_timestamp")
      .as[(String, String, String, String, String, java.sql.Timestamp)]
      .collect()
    assert(rows.length == 3, "unparseable line must drop")
    assert(rows(0)._3 == "order <VAR> accepted in <VAR> ms")
    assert(rows(0)._2 == rows(1)._2, "same template, same EventId")
    assert(rows(2)._3 == "retry <VAR> for order <VAR>")
    // hour offset applied (09:15 wall clock → 07:15)
    assert(rows(0)._6.toString.startsWith("2024-01-01 07:15:00"))
    assert(rows.forall(_._5 == "checkout"))
  }
}
