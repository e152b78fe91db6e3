package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: makes graft's native expressions
  * available WITHOUT library code running first — the deployment path
  * for plain-SQL users:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (The programmatic path, `GraftFunctions.register(spark)`, covers
  * sessions the library constructs itself, e.g. `Graft.session()`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, clazz, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    }
}
