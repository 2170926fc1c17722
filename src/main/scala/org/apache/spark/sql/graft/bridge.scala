package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression conversion, needed
  * to expose custom Catalyst expressions through the public Column API
  * (Spark 4 removed the public `new Column(expr)` constructor). Lives in
  * the org.apache.spark.sql namespace solely to satisfy the access
  * qualifier — the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to `ScalarSubquery` construction: wraps a 1-row/1-column
  * DataFrame as a scalar-subquery expression usable inside another
  * DataFrame's filter — the exact shape Spark's own InjectRuntimeFilter
  * uses for its bloom build side. The planner executes the subquery
  * once (SubqueryExec, result broadcast to every task) instead of
  * planning a 1-row cross join.
  *
  * VERSION NOTE: built and tested against Spark 4.1 (the classpath at
  * /opt/spark/jars). `ScalarSubquery`'s constructor shape and the
  * `ExpressionUtils` access point are internal API — re-verify both on
  * any Spark upgrade (BridgeSpec covers the contract).
  *
  * Attaching the SAME DataFrame to MULTIPLE predicates of one query is
  * safe: each call allocates a fresh `ScalarSubquery` expression (its
  * own exprId), and each attachment's subquery plan is planned
  * independently (canonically-equal instances are additionally
  * collapsed to one execution by the physical ReuseSubquery rule).
  * The subquery plan's internal attribute ids never leak into the
  * outer plan — the expression's output is its scalar VALUE, not the
  * plan's attributes — so no re-analysis or exprId rewrite is needed.
  * RuntimeFilterSpec's double-attach test pins the contract: one bloom
  * frame filtering two different key columns of one query, both
  * predicates present in the physical plan, no true match lost. */
object SubqueryBridge {
  def scalarExpr(df: org.apache.spark.sql.DataFrame): Expression = {
    val plan = df.queryExecution.analyzed
    require(plan.output.length == 1,
      s"scalar subquery needs exactly 1 column, got ${plan.output.length}")
    org.apache.spark.sql.catalyst.expressions.ScalarSubquery(plan)
  }
}

/** Bridge to `Observation.getOrEmpty` (`private[sql]`): a NON-blocking
  * metrics read (bounded 100 ms internal wait), unlike the public
  * `get` which blocks forever when the backing action never posts
  * listener events. Used to put a timeout + fallback around
  * convergence metrics that ride checkpoint actions. */
object ObservationBridge {
  def peek(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty.toMap
}
