package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Codegen hygiene for the custom expressions: several instances of
  * the same expression class can land in ONE Janino method body when
  * children are non-nullable (no per-instance null-check brace scope).
  * Fixed local identifiers would collide there — the compile failure
  * falls back to interpreted eval silently, forfeiting the measured
  * kernel win. `spark.sql.codegen.fallback=false` turns that silent
  * fallback into a test failure.
  */
class CodegenSpec extends SparkSuite {
  import spark.implicits._

  private def withNoFallback[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("≥2 DotProducts over non-nullable columns compile under fallback=false") {
    withNoFallback {
      // spark.range ids are non-nullable; arrays/strings built from
      // them stay non-nullable → all four kernels share one method body
      val df = spark.range(100).select(
        array(col("id").cast("double"), lit(1.0), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double"), lit(4.0)).as("b"))
      val out = df.select(
        VectorExpressions.dotProduct(col("a"), col("b")).as("d1"),
        VectorExpressions.dotProduct(col("b"), col("a")).as("d2"),
        VectorExpressions.dotProduct(col("a"), col("a")).as("d3"))
        .as[(Double, Double, Double)].collect()
      assert(out.length == 100)
      // id=2: a=(2,1,2), b=(3,2,4): a·b = 6+2+8 = 16, a·a = 4+1+4 = 9
      val r2 = out(2)
      assert(r2._1 == 16.0 && r2._2 == 16.0 && r2._3 == 9.0, r2.toString)
    }
  }

  test("≥2 Fingerprints over non-nullable strings compile under fallback=false") {
    withNoFallback {
      val df = spark.range(50).select(
        concat(lit("doc "), col("id").cast("string")).as("t"))
      val out = df.select(
        TextFunctions.fingerprint(col("t")).as("f1"),
        TextFunctions.fingerprint(concat(col("t"), lit("!"))).as("f2"))
        .as[(Long, Long)].collect()
      assert(out.length == 50)
      // interpreted reference for row 0 ("doc 0")
      def ref(s: String): Long =
        s.foldLeft(0L)((h, c) => (h * 31L + c.toLong) % 2147483647L)
      assert(out(0)._1 == ref("doc 0") && out(0)._2 == ref("doc 0!"))
      assert(out.forall(r => r._1 != r._2))
    }
  }

  test("mixed kernels in one projection (the lshBucket shape) under fallback=false") {
    withNoFallback {
      // 6 folded DotProducts in one projection — the exact shape the
      // LSH bucket key generates after a na.drop
      val dim = 8
      val df = spark.range(64).select(
        array((0 until dim).map(i =>
          (col("id") * (i + 1)).cast("double")): _*).as("v"))
      val bucket = graft.operators.Similarity.lshBucket(col("v"),
        planes = 6, rotation = 0, dim = dim)
      val n = df.select(bucket.as("b")).filter(col("b") >= 0).count()
      assert(n == 64L)
    }
  }
}
