package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` access shim for graft's v1 streaming
  * source — the standard pattern every pre-DSv2 Spark connector
  * uses: a v1 `Source.getBatch` must return a DataFrame whose
  * logical plan is flagged `isStreaming=true`, and the only
  * constructor for an arbitrary-plan DataFrame is
  * `Dataset.ofRows`, which is `private[sql]`. Nothing else from
  * the private surface is touched. */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-root `df`'s plan with the relation leaves selected by
    * `leafFilter` flagged streaming — the v1 `getBatch` contract.
    * Side lookups (e.g. deletion-vector sidecars joined against the
    * batch) must stay static, or the planner would see a
    * stream-stream join where a stream-static one is meant. */
  def asStreaming(df: DataFrame)(
      leafFilter: org.apache.spark.sql.sources.BaseRelation => Boolean): DataFrame = {
    val plan = df.queryExecution.logical.transformUp {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
        if !lr.isStreaming && leafFilter(lr.relation) => lr.copy(isStreaming = true)
    }
    ofRows(df.sparkSession, plan)
  }

  /** Re-plan a v1 `Sink.addBatch` DataFrame as an ordinary batch:
    * the incoming Dataset carries the streaming execution's
    * incremental plan, which batch writers must not re-analyze —
    * the standard v1-sink rebatching (what Delta Lake's own v1
    * DeltaSink does): take the already-planned InternalRow RDD and
    * wrap it as a fresh batch DataFrame of the same schema. */
  def rebatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** An empty streaming-flagged batch of the given schema. */
  def emptyStreaming(spark: SparkSession,
                     schema: org.apache.spark.sql.types.StructType): DataFrame =
    ofRows(spark, org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
      Nil, isStreaming = true))
}
