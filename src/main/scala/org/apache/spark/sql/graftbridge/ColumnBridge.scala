package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(expr)/Column.expr bridge — the
  * supported pattern for libraries that define native Catalyst expressions
  * is a shim inside the org.apache.spark.sql package (cf. SNIPPETS.md
  * snippets 2–3: the `DatasetFactory` / package-object trick).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
