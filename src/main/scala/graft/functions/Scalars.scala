package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.SparkBridge

/** THE scalar-fetch idiom (r17 verdict ask #6): every place an operator
  * needs a data-derived scalar (`max(key)` to place a deterministic
  * change batch, a corpus bound to seed arithmetic), it uses ONE of:
  *
  *   - [[Scalars.scalarOf]] — the value participates only in plan
  *     EXPRESSIONS: a non-correlated scalar subquery rides the plan,
  *     executes once per action with broadcast-literal semantics, and
  *     never round-trips the driver. This is the default.
  *   - a documented driver-state read — the value shapes DRIVER
  *     decisions Spark cannot express in a plan (manifest stats-pruning
  *     bounds for SnapshotLog.readRange/readBox/readPoint, manifest
  *     partitioning, plan-sizing dispatch counts). Those sites keep an
  *     explicit `.collect()`/`count()` with a `driver-state read`
  *     comment, so `grep -rn "\.collect()" operators/` audits to
  *     exactly the documented set.
  *
  * Anything else — a `.collect()` feeding expressions, or an
  * undocumented one — is a defect under this discipline. */
object Scalars {
  /** One-row one-column frame -> a Column usable in any expression.
    * Catalyst plans it as a non-correlated ScalarSubquery: computed
    * once per action, inlined into every task. */
  def scalarOf(df: DataFrame): Column = SparkBridge.scalarSubquery(df)
}
