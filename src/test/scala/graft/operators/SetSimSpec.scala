package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SetSimSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  /** Brute-force reference: ALL pairs with Jaccard >= tNum/tDen. */
  private def bruteForce(shingles: DataFrame, tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] = {
    val ids = shingles.select($"doc_id").distinct()
    val pairs = ids.select($"doc_id".as("id1"))
      .join(ids.select($"doc_id".as("id2")), $"id1" < $"id2")
    Dedup.jaccardCounts(pairs, shingles, "doc_id")
      .filter($"inter_sz" * lit(tDen) >= lit(tNum) * $"union_sz")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("similarityJoin equals brute-force all-pairs Jaccard (completeness + exactness)") {
    val shingles = Dedup.charShingles(docs, "doc_id", "text", 5).cache()
    val expected = bruteForce(shingles, 3, 10)
    val got = SetSim.similarityJoin(shingles, "doc_id", 3, 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture must produce qualifying pairs")
    assert(got == expected)
  }

  test("similarityJoin at a high threshold still matches brute force (sparser prefixes)") {
    val shingles = Dedup.charShingles(docs, "doc_id", "text", 5).cache()
    val expected = bruteForce(shingles, 1, 2)
    val got = SetSim.similarityJoin(shingles, "doc_id", 1, 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("prefixCandidates is complete for adversarial tiny sets incl. boundary Jaccard") {
    // hand-built sets hitting the ceil boundary exactly: J = 1/2,
    // 2/3, 1/3, 1 — each must be a candidate iff J >= 1/2 qualifies
    // it (completeness only: extra candidates are allowed, missed
    // qualifying pairs are not)
    val sets = Seq(
      1L -> Seq("a", "b"), // vs 2: inter {a,b}... see below
      2L -> Seq("a", "b", "c"), // J(1,2) = 2/3
      3L -> Seq("c", "d"), // J(2,3) = 1/4; J(3,4) = 1/3
      4L -> Seq("d", "e"),
      5L -> Seq("a", "b"), // J(1,5) = 1 (identical)
      6L -> Seq("f")) // isolated
    val shingles = sets.flatMap { case (id, ss) => ss.map(id -> _) }
      .toDF("doc_id", "shingle")
    val cands = SetSim.prefixCandidates(shingles, "doc_id", 1, 2)
      .as[(Long, Long)].collect().toSet
    val expected = bruteForce(shingles, 1, 2).map(r => (r._1, r._2))
    assert(expected.subsetOf(cands),
      s"missed qualifying pairs: ${expected.diff(cands)}")
    // the isolated doc shares nothing: must never appear
    assert(!cands.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("grouped similarityJoin equals within-stratum brute force and never crosses groups") {
    val shingles = Dedup.charShingles(docs, "doc_id", "text", 5,
      keepCols = Seq("lang", "source")).cache()
    // brute force: all same-(lang, source) pairs, full-document Jaccard
    val keyed = docs.select($"doc_id", $"lang", $"source")
    val pairs = keyed.select($"lang", $"source", $"doc_id".as("id1"))
      .join(keyed.select($"lang", $"source", $"doc_id".as("id2")),
        Seq("lang", "source"))
      .filter($"id1" < $"id2").select("id1", "id2")
    val expected = Dedup
      .jaccardCounts(pairs, shingles.select($"doc_id", $"shingle"), "doc_id")
      .filter($"inter_sz" * lit(4) >= lit(1) * $"union_sz")
      .as[(Long, Long, Long, Long)].collect().toSet
    val got = SetSim.similarityJoin(shingles, "doc_id", 1, 4,
        groupCols = Seq("lang", "source"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture must produce qualifying pairs")
    assert(got == expected)
    // no result pair may cross a stratum
    val strata = docs.select($"doc_id", concat_ws("|", $"lang", $"source"))
      .as[(Long, String)].collect().toMap
    got.foreach { case (a, b, _, _) => assert(strata(a) == strata(b)) }
  }

  test("prefixCandidates prunes versus the sharing-pairs upper bound") {
    val shingles = Dedup.charShingles(docs, "doc_id", "text", 5).cache()
    val sharing = shingles.select($"shingle", $"doc_id".as("id1"))
      .join(shingles.select($"shingle", $"doc_id".as("id2")), Seq("shingle"))
      .filter($"id1" < $"id2").select("id1", "id2").distinct().count()
    val cands = SetSim.prefixCandidates(shingles, "doc_id", 3, 10).count()
    assert(cands < sharing,
      s"prefix filter must prune: $cands candidates vs $sharing sharing pairs")
  }

  test("lshCandidatesGrouped equals the ungrouped candidates restricted to one stratum") {
    val shingles = Dedup.charShingles(docs, "doc_id", "text", 5)
    val bands = Dedup.lshBands(
      Dedup.minHashSignatures(shingles, "doc_id", k = 16),
      "doc_id", k = 16, bands = 4)
    val ungrouped = Dedup.lshCandidates(bands, "doc_id")
      .as[(Long, Long)].collect().toSet
    val grouped = Dedup.lshCandidatesGrouped(bands, "doc_id",
        docs.select($"doc_id", $"lang", $"source"), Seq("lang", "source"))
      .as[(Long, Long)].collect().toSet
    val strata = docs.select($"doc_id", concat_ws("|", $"lang", $"source"))
      .as[(Long, String)].collect().toMap
    val expected = ungrouped.filter { case (a, b) => strata(a) == strata(b) }
    assert(grouped == expected)
    assert(grouped.size < ungrouped.size,
      "stratum scoping should prune cross-stratum collisions on this fixture")
  }

  test("editDistanceNearDup keeps exactly the pairs within the relative bound") {
    val df = Seq(
      (1L, "hello world"), (2L, "hello vorld"), // dist 1, len 11: 1*100 <= 30*11
      (3L, "completely different text entirely"),
      (4L, "hello"), (5L, "hello")) // dist 0
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L), (2L, 3L))
      .toDF("id1", "id2")
    val got = SetSim.editDistanceNearDup(df, "doc_id", "text", pairs, 30, 100)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (4L, 5L, 0L)))
  }

  test("editDistanceNearDup length prefilter never drops a qualifying pair") {
    // |len1-len2| > bound implies levenshtein > bound: pairs that die
    // on the prefilter must be exactly pairs the distance would kill
    val df = Seq((1L, "abcdefghij"), (2L, "ab")) // lens 10, 2: diff 8 > 30% of 10
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val got = SetSim.editDistanceNearDup(df, "doc_id", "text", pairs, 30, 100)
    assert(got.isEmpty) // levenshtein would be >= 8 anyway
  }

  test("plan audit: no cartesian product in the similarity join") {
    val shingles = Dedup.charShingles(docs, "doc_id", "text", 5)
    val plan = SetSim.similarityJoin(shingles, "doc_id", 3, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
