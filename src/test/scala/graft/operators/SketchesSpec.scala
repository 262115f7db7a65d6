package graft.operators

import graft.SparkSuite
import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  // skewed token stream: token t_k appears 2^(7-k) times for k in
  // 0..7 plus a long tail of singletons — known exact counts
  private def items: DataFrame = {
    val skew = (0 until 8).flatMap(k => Seq.fill(1 << (7 - k))(s"t_$k"))
    val tail = (0 until 100).map(i => s"tail_$i")
    (skew ++ tail).toDF("tok")
  }

  private def exact: Map[String, Long] =
    items.groupBy("tok").count().as[(String, Long)].collect().toMap

  private val fp = TextFunctions.fingerprint(col("tok"))

  test("sketch size is bounded by depth x width and counts sum to n per row") {
    val sk = Sketches.cmsBuild(items, fp, depth = 4, width = 64)
    assert(sk.count() <= 4L * 64)
    val perRow = sk.groupBy("cms_row").agg(sum("cnt").as("s"))
      .select("s").as[Long].collect()
    val n = items.count()
    assert(perRow.toSeq === Seq.fill(4)(n))
  }

  test("estimates never undercount and are exact absent collisions") {
    val sk = Sketches.cmsBuild(items, fp, depth = 4, width = 512)
    val keys = items.distinct()
    val est = Sketches.cmsEstimate(sk, keys, fp, Seq("tok"), 4, 512)
      .as[(String, Long)].collect().toMap
    val ex = exact
    assert(est.keySet === ex.keySet)
    ex.foreach { case (k, c) => assert(est(k) >= c, s"undercount on $k") }
    // 108 distinct keys in 512 buckets x 4 rows: the min-of-rows
    // estimate should be exact for the planted heavy keys
    (0 until 8).foreach(k => assert(est(s"t_$k") === ex(s"t_$k")))
  }

  test("an unseen key estimates near zero") {
    val sk = Sketches.cmsBuild(items, fp, depth = 4, width = 512)
    val unseen = Seq("never_seen_key").toDF("tok")
    val est = Sketches.cmsEstimate(sk, unseen, fp, Seq("tok"), 4, 512)
      .select("cms_est").as[Long].head()
    // not guaranteed zero (collisions), but bounded by the heaviest
    // colliding bucket; with 108 keys in 512 buckets, expect tiny
    assert(est <= 2)
  }

  test("partial sketches merge to the full-corpus sketch") {
    val (d, w) = (4, 64)
    val a = items.limit(150)
    val b = items.exceptAll(a)
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuild(a, fp, d, w), Sketches.cmsBuild(b, fp, d, w))
    val full = Sketches.cmsBuild(items, fp, d, w)
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
  }

  test("heavy hitters: every true heavy key surfaces, tail stays out") {
    // total = 255 + 100 = 355; 5% = 17.75 -> true heavies are
    // t_0..t_4 (128, 64, 32, 16 is below at 4.5%... recompute: t_4=8)
    // counts: t_0=128 t_1=64 t_2=32 t_3=16 t_4=8; threshold 50/1000
    // of 355 = 17.75 -> t_0, t_1, t_2 qualify (32 >= 17.75), t_3=16 no
    val hh = Sketches.cmsHeavyHitters(items, fp, Seq("tok"),
        depth = 4, width = 512, minSupportPermille = 50)
      .select("tok").as[String].collect().toSet
    assert(Set("t_0", "t_1", "t_2").subsetOf(hh))
    assert(!hh.exists(_.startsWith("tail_")))
  }

  test("build rejects out-of-range parameters") {
    assertThrows[IllegalArgumentException] {
      Sketches.cmsBuild(items, fp, depth = 0, width = 64)
    }
    assertThrows[IllegalArgumentException] {
      Sketches.cmsBuild(items, fp, depth = 4, width = 1)
    }
  }
}
