package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSuite {
  import spark.implicits._

  private def stats(s: String): Map[String, Long] = {
    val names = Seq("dup_tok_frac_millis", "top_tok_frac_millis",
      "top_bigram_frac_millis")
    Seq(s).toDF("t")
      .select(TextFunctions.repetitionStats(col("t"))
        .map { case (n, c) => c.as(n) }: _*)
      .collect().head.getValuesMap[Long](names)
  }

  test("hand-computed ratios on a known string") {
    // toks = [a, a, a, b]: n=4, uniq=2, dup=(4-2)/4=500
    // top token a: 3/4 = 750; bigrams [a a, a a, a b]: top 2/3 = 666
    val s = stats("a a a b")
    assert(s("dup_tok_frac_millis") === 500)
    assert(s("top_tok_frac_millis") === 750)
    assert(s("top_bigram_frac_millis") === 666)
  }

  test("an all-distinct document scores minimal repetition") {
    val s = stats("one two three four five")
    assert(s("dup_tok_frac_millis") === 0)
    assert(s("top_tok_frac_millis") === 200) // 1/5
    assert(s("top_bigram_frac_millis") === 250) // 1/4
  }

  test("a degenerate loop maxes out") {
    val s = stats("spam spam spam spam")
    assert(s("dup_tok_frac_millis") === 750) // (4-1)/4
    assert(s("top_tok_frac_millis") === 1000)
    assert(s("top_bigram_frac_millis") === 1000)
  }

  test("single-token and surrounding-whitespace edges") {
    val s = stats("  lonely  ")
    assert(s("dup_tok_frac_millis") === 0)
    assert(s("top_tok_frac_millis") === 1000) // 1/1
    assert(s("top_bigram_frac_millis") === 0) // no bigrams
  }
}
