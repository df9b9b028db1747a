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

  /** Rebuild a checkpoint-backed frame with its propagated plan
    * statistics DROPPED (reset to the conf default).
    *
    * [[LogicalRDD]] forwards its origin plan's `Statistics` so that
    * broadcast decisions survive a checkpoint — the right call for a
    * one-shot checkpoint, but poison for an ITERATIVE loop: the
    * estimate compounds multiplicatively through every round's joins,
    * `sizeInBytes` roughly squares per round, the BigInt's DIGIT COUNT
    * doubles, and Catalyst's stats arithmetic itself turns exponential —
    * measured 505 s of pure driver-side `BigInteger.multiply` for one
    * round's planning by round 12 of the component loop. Dropping
    * originStats at each round boundary keeps every round's stats O(1)
    * while the checkpoint still truncates lineage. The frame must
    * already be materialized (its LogicalRDD leaves re-used as-is). */
  def dropOriginStats(df: DataFrame): DataFrame = {
    val spark =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    def fresh(lr: LogicalRDD): LogicalRDD =
      LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
        lr.outputOrdering, lr.isStreaming)(spark, None, None)
    // NOT a transform: LogicalRDD's case equality spans only its first
    // parameter list, so the stats-less twin compares EQUAL to the
    // original and every equality-gated rewrite (transform,
    // withNewChildren) silently keeps the old node, origin stats and
    // all. Rebuild the known root shapes by direct construction.
    val plan = df.queryExecution.analyzed match {
      case lr: LogicalRDD => fresh(lr)
      case p @ org.apache.spark.sql.catalyst.plans.logical.Project(
          list, lr: LogicalRDD) =>
        org.apache.spark.sql.catalyst.plans.logical.Project(list, fresh(lr))
      case other => throw new IllegalArgumentException(
        "dropOriginStats expects a checkpoint-backed frame " +
          s"(LogicalRDD or Project over one); got ${other.nodeName}")
    }
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)
  }

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
