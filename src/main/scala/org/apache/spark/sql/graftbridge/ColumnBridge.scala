package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 unified `Column` over ColumnNode and made the direct
  * Expression→Column constructor `private[sql]` (classic
  * `ExpressionUtils`). graft's typed Column API builds its expressions
  * directly — a plain `SparkSession` user must get a working
  * `Similarity.dot` without the session-extension registration (which
  * remains in place solely so the same expressions resolve from SQL text).
  * Living under `org.apache.spark.sql` grants exactly that access; this is
  * the standard extension-library idiom for classic-mode Spark.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
