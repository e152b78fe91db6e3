package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** The one sanctioned crossing between graft's programmatically-built
  * Catalyst expressions and the public Column API.
  *
  * Spark 4 made `Column` a thin wrapper over `ColumnNode` and fenced
  * the Expression⇄Column converters (`classic.ExpressionUtils`) as
  * `private[sql]`. Registry-built expressions don't need them — the
  * FunctionRegistry path (GraftExtensions) covers every graft
  * expression constructible from SQL arguments. [[graft.functions.IvfRoute]]
  * cannot take that path: it carries a runtime `Broadcast` handle
  * (the coarse-quantizer index), which no SQL builder signature can
  * express. This bridge exposes exactly the two converters, nothing
  * else.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
