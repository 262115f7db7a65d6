package graft.operators

import graft.SparkSuite

class TextRetrievalSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta beta gamma"),
    (2L, "alpha gamma gamma gamma"),
    (3L, "alpha delta"),
    (4L, "  alpha   ") // whitespace-padded single-term doc
  ).toDF("doc_id", "text")

  test("termCounts: whitespace split, empty tokens dropped, exact tf") {
    val got = TextRetrieval.termCounts(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(got.contains((1L, "beta", 2L)))
    assert(got.contains((2L, "gamma", 3L)))
    assert(got.contains((4L, "alpha", 1L)))
    assert(!got.exists(_._2 == ""))
  }

  test("keywords ranks by tf/df with term tiebreak; common terms sink") {
    // df: alpha=4, beta=1, gamma=2, delta=1
    // doc1 scores: beta 2/1=2.0, gamma 1/2=0.5, alpha 1/4=0.25
    val got = TextRetrieval.keywords(docs, "doc_id", "text", k = 2)
      .select("doc_id", "rank", "term", "score_micro")
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).map { case (d, rs) =>
        d -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq }
    assert(got(1L) == Seq(("beta", 2000000L), ("gamma", 500000L)))
    assert(got(2L) == Seq(("gamma", 1500000L), ("alpha", 250000L)))
    assert(got(3L) == Seq(("delta", 1000000L), ("alpha", 250000L)))
    assert(got(4L) == Seq(("alpha", 250000L)))
  }

  test("conjunctiveSearch: AND semantics, Σtf score, duplicate query terms collapse") {
    val got = TextRetrieval.conjunctiveSearch(docs, "doc_id", "text",
        Seq("alpha", "gamma", "gamma"))
      .as[(Long, Long)].collect().toMap
    // docs containing BOTH alpha and gamma: 1 (1+1=2), 2 (1+3=4)
    assert(got == Map(1L -> 2L, 2L -> 4L))
  }

  test("conjunctiveSearch: no match when any term is missing everywhere") {
    val got = TextRetrieval.conjunctiveSearch(docs, "doc_id", "text",
      Seq("alpha", "zeta"))
    assert(got.isEmpty)
  }
}
