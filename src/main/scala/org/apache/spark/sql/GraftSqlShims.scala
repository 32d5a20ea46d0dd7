package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst [[Expression]]s and the public [[Column]] API.
  *
  * Spark 4.x decoupled `Column` from Catalyst (columns wrap `ColumnNode`s so the
  * same API serves Spark Connect); the classic conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`. This
  * shim re-exports the two conversions graft needs, from inside the `sql`
  * package — the standard technique for Spark libraries that ship custom
  * Catalyst expressions.
  */
object GraftSqlShims {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a (classic) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
