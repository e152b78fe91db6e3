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
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_], builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    inject("long_dot", classOf[LongDot],
      children => LongDot(children.head, children(1)))
    inject("graft_hash60", classOf[Hash60], children => Hash60(children.head))
    inject("graft_simhash32", classOf[SimHash32], children => SimHash32(children.head))
    inject("graft_minhash8", classOf[MinHashK], children => MinHashK(children.head,
      GraftFunctions.MinhashA, GraftFunctions.MinhashB, GraftFunctions.MinhashP))
    inject("graft_minhash", classOf[MinHashK], GraftFunctions.minhashBuilder)
    inject("graft_hash60_all", classOf[Hash60All], children => Hash60All(children.head))
    inject("graft_xorfold", classOf[XorFold], children => XorFold(children.head))
  }
}
