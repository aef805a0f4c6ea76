package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made `Column` expression-agnostic (it wraps a ColumnNode); the
  * classic-backend converters live behind `private[sql]`. Extension
  * libraries bridge from inside the `org.apache.spark.sql` namespace —
  * this object is the single place graft touches non-public Spark API.
  *
  * SPARK-VERSION RISK is pinned by `graft.BridgeContractSpec` (round
  * 17): the full private-API contract this bridge and RddShareBridge
  * lean on is asserted in ONE suite, so a Spark bump that changes the
  * semantics produces a single red flare there.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
