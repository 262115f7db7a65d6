package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions for
  * custom Catalyst expressions (Spark 4 wraps Column around
  * ColumnNode; `classic.ExpressionUtils` is the supported classic-API
  * path but is package-private). Standard extension-library pattern.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The cached RDD behind a `localCheckpoint()`ed Dataset (its plan
    * is a LogicalRDD over the persisted blocks). Iterative operators
    * use this to release a SUPERSEDED round's blocks as soon as the
    * next round is materialized — without it, a k-round loop pins
    * O(k·|state|) storage until SparkContext death, and that leak is
    * the caller's memory, not the operator's. Returns None for plans
    * that are not checkpoint scans (never unpersist what you did not
    * checkpoint).
    */
  def checkpointedRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      // the isLocallyCheckpointed guard makes the contract real:
      // LogicalRDD also backs createDataFrame(rdd, schema) frames,
      // and releasing a CALLER-persisted rdd there would drop a cache
      // this code does not own
      case lr: execution.LogicalRDD
          if org.apache.spark.rdd.GraftRddShims.isLocallyCheckpointed(lr.rdd) =>
        Some(lr.rdd)
      case _ => None
    }

  /** Unpersist the checkpoint blocks behind `df` (no-op otherwise). */
  def releaseCheckpoint(df: Dataset[_]): Unit =
    checkpointedRdd(df).foreach(_.unpersist(blocking = false))

  /** Drain the listener bus (`private[spark]`) — lets specs that
    * count jobs via a SparkListener assert deterministically instead
    * of sleeping.
    */
  def drainListeners(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
