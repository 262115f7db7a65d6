package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("exactKeepFirst keeps exactly the minimum-order row per key") {
    val df = Seq((3L, "x"), (1L, "x"), (2L, "y"), (5L, "x"))
      .toDF("doc_id", "text")
    val got = Dedup.exactKeepFirst(df, Seq("text"), "doc_id")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "x"), (2L, "y")))
  }

  test("exactKeepFirst tiebreaks pin the survivor when (key, order) ties") {
    // equal key AND equal order value, differing payload: without a
    // tiebreak the survivor is partitioning-dependent; with one it is
    // pinned (r3 verdict ask #3)
    val df = Seq((1L, 10L, "b-payload"), (1L, 10L, "a-payload"),
      (2L, 5L, "solo")).toDF("k", "ord", "payload")
    (1 to 3).foreach { rep =>
      val got = Dedup.exactKeepFirst(
        df.repartition(rep, col("payload")), // vary physical order
        Seq("k"), "ord", col("payload"))
        .as[(Long, Long, String)].collect().toSet
      assert(got == Set((1L, 10L, "a-payload"), (2L, 5L, "solo")))
    }
  }

  test("dropAllDuplicates removes every member of a duplicated group (A8)") {
    val df = Seq((3L, "x"), (1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val got = Dedup.dropAllDuplicates(df, Seq("text"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "y")))
  }

  test("MinHash LSH finds planted near-duplicates with high recall, bounded candidates") {
    // plant near-dups: each selected doc copied with a tiny suffix edit
    val base = docs.select($"doc_id", $"text")
    val nearDups = base.filter($"doc_id" % 5 === 0)
      .select(($"doc_id" + 1000000).as("doc_id"),
        concat($"text", lit(" zz")).as("text"))
    val all = base.unionByName(nearDups).cache()
    val planted = nearDups.select(($"doc_id" - 1000000).as("id1"),
      $"doc_id".as("id2")).as[(Long, Long)].collect().toSet

    // rows-per-band = 8: collision P = s^8 per band — separates the
    // planted s≈0.97 near-dups from this corpus's high background
    // similarity (shared ~30-word vocab ⇒ pairwise shingle-Jaccard
    // ~0.5-0.7, which 2-row bands would all collide on)
    val shingles = Dedup.charShingles(all, "doc_id", "text", 5).cache()
    val sigs = Dedup.minHashSignatures(shingles, "doc_id", k = 32)
    val cands = Dedup.lshCandidates(
      Dedup.lshBands(sigs, "doc_id", k = 32, bands = 4), "doc_id")
      .as[(Long, Long)].collect().toSet

    val found = planted.intersect(cands)
    val recall = found.size.toDouble / planted.size
    assert(recall >= 0.95, s"recall $recall: found ${found.size}/${planted.size}")
    // candidates must stay far below all-pairs (the point of LSH)
    val n = all.count()
    assert(cands.size < n * n / 20,
      s"candidate explosion: ${cands.size} pairs for $n docs")
    all.unpersist(); shingles.unpersist()
  }

  test("LSH candidates verified by exact Jaccard separate dups from non-dups") {
    val base = docs.select($"doc_id", $"text").limit(100)
    val nearDups = base.filter($"doc_id" % 5 === 0)
      .select(($"doc_id" + 1000000).as("doc_id"),
        concat($"text", lit(" zz")).as("text"))
    val all = base.unionByName(nearDups).cache()
    val shingles = Dedup.charShingles(all, "doc_id", "text", 5).cache()
    val sigs = Dedup.minHashSignatures(shingles, "doc_id", k = 32)
    val cands = Dedup.lshCandidates(
      Dedup.lshBands(sigs, "doc_id", k = 32, bands = 4), "doc_id")
    val verified = Dedup.jaccardCounts(cands, shingles, "doc_id")
      .withColumn("jacc", $"inter_sz" / $"union_sz").cache()
    // every planted candidate has near-1 jaccard
    val planted = verified.filter($"id2" - $"id1" === 1000000)
    assert(planted.filter($"jacc" <= 0.8).count() == 0)
    // exactness: distributed (inter, union) counts equal a driver-local
    // shingle-set computation on sampled pairs
    val texts = all.as[(Long, String)].collect().toMap
    // mirror charShingles(n=5): indices 1..max(len-4, 1), 5-char cuts
    def shingleSet(s: String): Set[String] =
      (1 to math.max(s.length - 4, 1)).map(i => s.substring(i - 1,
        math.min(i + 4, s.length))).toSet
    val sample = verified.orderBy($"id1", $"id2").limit(10)
      .select($"id1", $"id2", $"inter_sz", $"union_sz")
      .as[(Long, Long, Long, Long)].collect()
    assert(sample.nonEmpty)
    sample.foreach { case (id1, id2, inter, union) =>
      val (s1, s2) = (shingleSet(texts(id1)), shingleSet(texts(id2)))
      assert(inter == s1.intersect(s2).size.toLong, s"pair ($id1,$id2) inter")
      assert(union == s1.union(s2).size.toLong, s"pair ($id1,$id2) union")
    }
    verified.unpersist(); all.unpersist(); shingles.unpersist()
  }

  test("simhash: near-identical docs within small hamming distance, unrelated docs far") {
    val base = docs.select($"doc_id", $"text").limit(60)
    val edited = base.select(($"doc_id" + 1000000).as("doc_id"),
      concat($"text", lit(" zz qq")).as("text"))
    val sh = Dedup.simHash(base.unionByName(edited), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val dists = sh.keys.filter(_ < 1000000).toSeq.map { id =>
      java.lang.Long.bitCount(sh(id) ^ sh(id + 1000000))
    }
    val ids = sh.keys.filter(_ < 1000000).toSeq.sorted
    val unrelated = ids.zip(ids.tail).map { case (a, b) =>
      java.lang.Long.bitCount(sh(a) ^ sh(b))
    }.sorted
    val medianUnrelated = unrelated(unrelated.size / 2)
    // locality property: the WORST near-dup distance sits below the
    // MEDIAN unrelated distance (distribution separation, robust to
    // this corpus's shared vocabulary)
    assert(dists.max < medianUnrelated,
      s"no separation: near-dup max ${dists.max} vs unrelated median $medianUnrelated")
    assert(dists.sum.toDouble / dists.size < unrelated.sum.toDouble / unrelated.size)
  }

  test("lshBands explode form equals the per-band definition row for row") {
    // the one-pass posexplode refactor must emit exactly the rows the
    // band definition describes: for each id and band b, band_hash =
    // bandCombine(mh_{b*rows} .. mh_{(b+1)*rows-1})
    import graft.functions.MirrorHash
    val shingles = Dedup.charShingles(docs.limit(50), "doc_id", "text", 5)
    val sigs = Dedup.minHashSignatures(shingles, "doc_id", k = 16).cache()
    val got = Dedup.lshBands(sigs, "doc_id", k = 16, bands = 4)
      .as[(Long, Int, Long)].collect().toSet
    val expected = (0 until 4).flatMap { b =>
      val cols = (b * 4 until (b + 1) * 4).map(i => col(s"mh_$i"))
      sigs.select(col("doc_id"), lit(b).as("band_idx"),
          MirrorHash.bandCombine(cols).as("band_hash"))
        .as[(Long, Int, Long)].collect()
    }.toSet
    assert(got == expected)
    sigs.unpersist()
  }

  test("jaccardCounts keeps zero-intersection pairs with inter_sz = 0") {
    // the array-intersection rewrite must preserve the old left-join
    // repair semantics: a candidate pair sharing NO shingle still
    // appears, with inter_sz 0 and union_sz = sz1 + sz2
    val df = Seq((1L, "aaaaaa"), (2L, "bbbbbb")).toDF("doc_id", "text")
    val shingles = Dedup.charShingles(df, "doc_id", "text", 5)
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val got = Dedup.jaccardCounts(pairs, shingles, "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    // "aaaaaa" -> {"aaaaa"} (2 positions, 1 distinct); same for b
    assert(got == Set((1L, 2L, 0L, 2L)))
  }
}
