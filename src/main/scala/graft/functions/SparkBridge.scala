package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Column <-> catalyst Expression bridge. `ExpressionUtils` is
  * `private[sql]` in Spark 4, so graft's native expressions reach it from
  * inside the `org.apache.spark.sql` package tree — the standard pattern
  * for third-party Catalyst extensions.
  */
object SparkBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the block-manager storage behind a `localCheckpoint()`ed
    * frame (or any frame derived from one): find the pinned RDDs under
    * the plan's [[LogicalRDD]] leaves and unpersist them.
    *
    * `Dataset.unpersist` only covers CacheManager entries, so superseded
    * checkpoints of an iterative algorithm (label propagation, shortest
    * path) otherwise accumulate one pinned copy per round until context
    * GC gets around to them — on a shared cluster that is real executor
    * storage pressure. Non-blocking removal — but note a
    * `localCheckpoint()`ed RDD has its lineage truncated and CANNOT be
    * recomputed: a task that races the removal fails hard with a
    * missing-checkpoint-block error. Callers must therefore unpersist
    * round N-1 only after round N is synchronously materialized and no
    * concurrent action still reads the old frame (the discipline every
    * iterative loop here follows).
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** The aggregate half of Spark's runtime bloom filter (the machinery
    * behind `InjectRuntimeFilter`, which Spark only triggers for shuffle
    * joins): folds `xxhash64` values into one BloomFilter binary blob.
    * Not SQL-registered upstream, hence reached through the bridge. */
  def bloomFilterAgg(hashCol: Column, expectedItems: Long): Column =
    column(new BloomFilterAggregate(expression(hashCol), expectedItems)
      .toAggregateExpression())

  /** Wrap a one-row one-column frame as a scalar subquery expression.
    * `BloomFilterMightContain` only accepts a constant or scalar-subquery
    * bloom argument — a join-produced attribute is rejected — so this is
    * the supported way to hand a distributed-computed sketch to the
    * probe side: the subquery plan runs once and its result is inlined
    * into every task (broadcast-literal semantics, no driver round-trip
    * in user code). */
  def scalarSubquery(df: DataFrame): Column =
    column(ScalarSubquery(df.queryExecution.analyzed))

  /** Probe half of the runtime bloom filter pair. */
  def mightContain(bloom: Column, hashCol: Column): Column =
    column(BloomFilterMightContain(expression(bloom), expression(hashCol)))
}
