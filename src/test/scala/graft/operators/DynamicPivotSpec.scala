package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DynamicPivotSpec extends SparkSuite {
  import spark.implicits._

  private val rows = Seq(
    ("c1", Some("search")), ("c1", Some("search")), ("c1", Some("calc")),
    ("c2", Some("browse")), ("c2", None),
    ("c3", None) // no non-null pivot values at all
  ).toDF("conv_id", "tool")

  test("columns are discovered from the data, sorted, prefixed; cells fill 0") {
    val wide = DynamicPivot.pivotWide(rows, Seq("conv_id"), "tool",
      count(lit(1)), prefix = "tool_")
    assert(wide.columns.toSeq ==
      Seq("conv_id", "tool_browse", "tool_calc", "tool_search"))
    val byConv = wide.as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(byConv("c1") == (("c1", 0L, 1L, 2L)))
    assert(byConv("c2") == (("c2", 1L, 0L, 0L)))
    // c3 has only null pivot values → contributes no row (matches
    // conditional-aggregation-with-WHERE oracle semantics)
    assert(!byConv.contains("c3"))
  }

  test("handles the reference's >1000-dynamic-columns shape") {
    // TraceInOneRowExploder.py:2-21: ">1000 and not static" columns
    val wide = (0 until 3000).map(i => (s"c${i % 3}", f"m${i % 1200}%04d"))
      .toDF("conv_id", "tool")
    val out = DynamicPivot.pivotWide(wide, Seq("conv_id"), "tool",
      count(lit(1)), prefix = "m_")
    assert(out.columns.length == 1201, s"got ${out.columns.length}")
    assert(out.count() == 3)
    // m0000 occurs at i ∈ {0,1200,2400}, all ≡ 0 (mod 3) → conv c0 ×3;
    // m0001 occurs only at i ≡ 1 (mod 3) → conv c0 never sees it
    val r = out.filter($"conv_id" === "c0").head()
    assert(r.getAs[Long]("m_m0000") == 3L)
    assert(r.getAs[Long]("m_m0001") == 0L)
  }

  test("maxColumns guards runaway vocabularies") {
    val many = (0 until 50).map(i => ("c", s"v$i")).toDF("conv_id", "tool")
    intercept[IllegalArgumentException] {
      DynamicPivot.pivotWide(many, Seq("conv_id"), "tool",
        count(lit(1)), maxColumns = 10)
    }
  }
}
