package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, LongType, TimestampType}
import org.apache.spark.sql.{Column, GraftShims, SparkSessionExtensions}

import graft.model.Tier

/** Continuous-aggregate query routing (SURVEY.md §4 item 3, the
  * optimizer-stretch goal): a logical [[Rule]] that rewrites
  *
  * {{{ raw_turns.groupBy(conv_id, tier_bucket(ts, "1h"))
  *       .agg(count(*), count(tool), sum(length(text)), ...) }}}
  *
  * to an equivalent aggregate over the PRE-COMPUTED tier table —
  * turning a scan of 10^12 raw turns into a scan of the (orders of
  * magnitude smaller) 1h tier. The cascade's algebraic-partials
  * discipline is what makes the rewrite exact: raw count(*) ==
  * sum(turn_cnt), raw sum(length(text)) == sum(text_len_sum), etc.
  *
  * Queries use [[TierRouting.tierBucket]] — a custom codegen'd
  * expression that evaluates the same floor-truncation arithmetic as
  * `Rollup.bucket`, so plans are CORRECT WITHOUT the rule and merely
  * faster with it (the grouping key is also the rule's routing
  * marker; recognizing a raw `timestamp_micros(us - pmod(us, w))`
  * tree would be brittle).
  *
  * Registration: `TierRouting.install(spark)` (experimental methods)
  * or `withExtensions(new GraftExtensions)` before session build.
  */
object TierRouting {

  /** Marker + arithmetic: floor `ts` to the tier bucket. */
  case class TierBucket(child: Expression, tierName: String)
      extends UnaryExpression {
    private val widthUs: Long = Tier(tierName).millis * 1000L
    override def dataType: DataType = TimestampType
    override def nullSafeEval(v: Any): Any = {
      val us = v.asInstanceOf[Long] // TimestampType is epoch micros
      java.lang.Long.valueOf(us - java.lang.Math.floorMod(us, widthUs))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $c - java.lang.Math.floorMod($c, ${widthUs}L);")
    override def sql: String = s"tier_bucket(${child.sql}, '$tierName')"
    override protected def withNewChildInternal(c: Expression): TierBucket =
      copy(child = c)
  }

  def tierBucket(ts: Column, tier: Tier): Column =
    GraftShims.column(TierBucket(GraftShims.expression(ts).transformUp {
      // accept NTZ columns like Rollup.bucket's cast does
      case e if e.dataType != TimestampType => Cast(e, TimestampType)
    }, tier.name))

  /** raw-table path prefix → warehouse root with tier_1m/1h/1d dirs.
    * (A real deployment keys this in the catalog; a TrieMap is the
    * sandbox stand-in.)
    */
  private val catalog = TrieMap.empty[String, String]

  def registerWarehouse(rawPathPrefix: String, warehouse: String): Unit =
    catalog.put(rawPathPrefix, warehouse)

  def clearRegistry(): Unit = catalog.clear()

  /** Which tier table serves a requested bucket width: exact match
    * only (coarser requests could fold a finer tier — left simple).
    * Reads the pipeline's published serving dirs
    * (TranscriptStore.publishServing), not the ChronoTable internals.
    */
  private def tierDir(warehouse: String, tierName: String): String =
    s"$warehouse/serve/tier_${tierName}"

  object RouteToTier extends Rule[LogicalPlan] {

    private def rawWarehouse(plan: LogicalPlan): Option[String] =
      plan match {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          val paths = fs.location.rootPaths.map(_.toString)
          catalog.collectFirst {
            case (prefix, wh) if paths.exists(_.contains(prefix)) => wh
          }
        case p if p.children.size == 1 => rawWarehouse(p.children.head)
        case _ => None
      }

    /** Map a raw-side aggregate function to the tier-side equivalent
      * over the tier columns. None → not routable.
      */
    private def mapAgg(fn: AggregateFunction,
        tierCol: String => Expression): Option[Expression] = fn match {
      case Count(Seq(Literal(1, _))) => Some(Sum(tierCol("turn_cnt")).toAggregateExpression())
      case Count(Seq(a: Attribute)) if a.name == "tool" =>
        Some(Sum(tierCol("tool_cnt")).toAggregateExpression())
      case Sum(Cast(Length(a: Attribute), LongType, _, _), _) if a.name == "text" =>
        Some(Sum(tierCol("text_len_sum")).toAggregateExpression())
      case Sum(Length(a: Attribute), _) if a.name == "text" =>
        Some(Sum(tierCol("text_len_sum")).toAggregateExpression())
      case Min(Cast(Length(a: Attribute), LongType, _, _)) if a.name == "text" =>
        Some(Min(tierCol("text_len_min")).toAggregateExpression())
      case Max(Cast(Length(a: Attribute), LongType, _, _)) if a.name == "text" =>
        Some(Max(tierCol("text_len_max")).toAggregateExpression())
      case _ => None
    }

    /** TierBucket may sit inline in the grouping list (pre-optimizer
      * shape) or be pulled into a child Project alias by
      * PullOutGroupingExpressions (extraOptimizations run AFTER the
      * main batch). Resolve a grouping expression to a TierBucket
      * through one Project hop.
      */
    private def resolveTierBucket(e: Expression, child: LogicalPlan): Option[TierBucket] =
      e match {
        case t: TierBucket => Some(t)
        case a: Attribute =>
          child.collectFirst {
            case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
          }.flatMap(_.projectList.collectFirst {
            case al @ Alias(t: TierBucket, _) if al.exprId == a.exprId => t
          })
        case _ => None
      }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _) if groupings.size == 2 =>
        val tbOpt = groupings.flatMap(g => resolveTierBucket(g, child)).headOption
        val routed = for {
          tb <- tbOpt
          wh <- rawWarehouse(child)
          convGroup <- groupings.collectFirst {
            case a: Attribute if a.name == "conv_id" => a }
          tbAttrIds = groupings.collect {
            case a: Attribute if resolveTierBucket(a, child).isDefined => a.exprId
          }.toSet
          tierPlan = SparkSession.active.read
            .parquet(tierDir(wh, tb.tierName))
            .queryExecution.analyzed
          out = tierPlan.output.map(a => a.name -> a).toMap
          if out.contains("conv_id") && out.contains("bucket_ts")
          mapped <- mapAll(aggExprs, tbAttrIds, out)
        } yield Aggregate(
          Seq(out("conv_id"), out("bucket_ts")), mapped, tierPlan)
        routed.getOrElse(agg)
    }

    /** Rewrite the output list; every aggregate must map, grouping
      * refs re-point at tier columns, names/exprIds preserved so
      * parents stay resolved.
      */
    private def mapAll(aggExprs: Seq[NamedExpression], tbAttrIds: Set[ExprId],
        out: Map[String, Attribute]): Option[Seq[NamedExpression]] = {
      val mapped = aggExprs.map {
        case a: Attribute if a.name == "conv_id" =>
          Some(Alias(out("conv_id"), a.name)(exprId = a.exprId))
        case al @ Alias(t: TierBucket, name) =>
          Some(Alias(out("bucket_ts"), name)(exprId = al.exprId))
        case al @ Alias(a: Attribute, name) if tbAttrIds.contains(a.exprId) =>
          Some(Alias(out("bucket_ts"), name)(exprId = al.exprId))
        case al @ Alias(ae: AggregateExpression, name) =>
          mapAgg(ae.aggregateFunction, n => out(n))
            .map(e => Alias(e, name)(exprId = al.exprId))
        case _ => None
      }
      if (mapped.forall(_.isDefined)) Some(mapped.flatten) else None
    }
  }

  /** Inject into an existing session (sandbox path). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RouteToTier))
      spark.experimental.extraOptimizations = cur :+ RouteToTier
  }
}

/** `withExtensions` registration for cluster deployments:
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => TierRouting.RouteToTier)
}
