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

  test("maxColumns guards runaway vocabularies") {
    val many = (0 until 50).map(i => ("c", s"v$i")).toDF("conv_id", "tool")
    intercept[IllegalArgumentException] {
      DynamicPivot.pivotWide(many, Seq("conv_id"), "tool",
        count(lit(1)), maxColumns = 10)
    }
  }
}
