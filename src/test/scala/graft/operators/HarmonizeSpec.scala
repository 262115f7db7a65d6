package graft.operators

import graft.SparkSuite

class HarmonizeSpec extends SparkSuite {
  import spark.implicits._

  test("drops exactly the all-null columns in one aggregate pass") {
    val df = Seq(
      (1, Option.empty[String], Some(1.0), Option.empty[Long]),
      (2, Option.empty[String], None, Option.empty[Long]),
      (3, Option.empty[String], Some(3.0), Option.empty[Long]))
      .toDF("id", "dead1", "sparse", "dead2")
    val got = Harmonize.dropAllNullColumns(df)
    assert(got.columns.toSeq == Seq("id", "sparse"))
    assert(got.count() == 3)
  }

  test("no-op (same plan, no extra scan) when every column has data") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "s")
    val got = Harmonize.dropAllNullColumns(df)
    assert(got.columns.toSeq == Seq("id", "s"))
    assert(got eq df, "must return the input frame unchanged")
  }

  test("empty frame keeps its schema (no rows ≠ all-null)") {
    val df = Seq((1, "a")).toDF("id", "s").limit(0)
    val got = Harmonize.dropAllNullColumns(df)
    assert(got.columns.toSeq == Seq("id", "s"))
  }

  test("survives the reference's >1000-wide pivot shape") {
    import org.apache.spark.sql.functions._
    val wide = spark.range(50).select(
      (col("id") +: (0 until 1200).map(i =>
        (if (i % 3 == 0) lit(null).cast("long") else lit(i.toLong)).as(s"m_$i")): _*)
    )
    val got = Harmonize.dropAllNullColumns(wide)
    assert(got.columns.length == 1 + 1200 - 400)
    assert(!got.columns.contains("m_0") && got.columns.contains("m_1"))
  }
}
