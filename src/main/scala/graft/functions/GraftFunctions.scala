package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.TierRouting

/** SQL registration of the engine's custom Catalyst expressions, so
  * `spark.sql` users get the same surface as the DataFrame API:
  *
  *   - `graft_fingerprint(text)` — rolling code-point fingerprint
  *   - `graft_dot(a, b)`         — allocation-free Σ aᵢ·bᵢ
  *   - `tier_bucket(ts, '1h')`   — tier floor bucket (also the
  *     routing marker [[graft.plans.TierRouting]] rewrites on)
  *
  * Two registration paths, same builders: [[register]] injects into a
  * live session's function registry (sandbox/tests);
  * [[graft.plans.GraftExtensions]] injects via
  * `SparkSessionExtensions` for `--conf spark.sql.extensions=`
  * cluster deployments.
  */
object GraftFunctions {

  /** (name, builder, usage) triples shared by both registration paths. */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_fingerprint",
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_fingerprint(text)")
        TextFunctions.Fingerprint(children.head)
      },
      "graft_fingerprint(text) - rolling (h*31 + codepoint) mod (2^31-1) fingerprint"),
    ("graft_dot",
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(a, b)")
        VectorExpressions.DotProduct(children.head, children(1))
      },
      "graft_dot(a, b) - left-to-right dot product of two array<double>"),
    ("tier_bucket",
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "tier_bucket(ts, '<n><s|m|h|d|w|mo|y>')")
        val spec = children(1) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"tier_bucket width must be a string literal, got $other")
        }
        val ts = children.head match {
          case e if e.dataType == TimestampType => e
          case e => Cast(e, TimestampType)
        }
        TierRouting.TierBucket(ts, spec)
      },
      "tier_bucket(ts, width) - floor ts to a '<n><s|m|h|d|w|mo|y>' bucket " +
        "(the tier-routing marker: tier-divisible widths serve from tiers)"))

  /** Register into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder, usage) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage),
        builder)
    }
}
