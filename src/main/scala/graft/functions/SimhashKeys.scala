package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All C(blocks, keyBlocks) block-combination keys of a simhash
  * signature in ONE native pass:
  * `graft_simhash_keys(sig, blocks, keyBlocks, width)` returns
  * `array<bigint>` where element i is the concatenation of the
  * signature's `keyBlocks` width-bit blocks selected by the i-th
  * lexicographic combination — the Manku multi-block key family
  * behind [[graft.operators.TextOps.dedupSimhashSharded]].
  *
  * Why native: the spelled-out form is an `array(...)` literal of
  * C(blocks,keyBlocks) named_structs, each ORing keyBlocks
  * shift-and-mask terms — at the production (10, 4) geometry that is
  * 210 structs × 4 terms, which blows the 64 KB whole-stage-codegen
  * method limit and drags the whole key-explode stage into
  * interpreted mode (observed on the first sf10 run). This expression
  * is one tight loop over a process-wide cached combination table;
  * the generate stage stays inside codegen.
  *
  * Null signature → null row (UnaryExpression default).
  */
case class SimhashKeys(child: Expression,
    blocks: Int, keyBlocks: Int, width: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_keys requires bigint, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SimhashKeys.keys(input.asInstanceOf[Long], blocks, keyBlocks, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.SimhashKeys.keys($s, $blocks, $keyBlocks, $width)")

  override protected def withNewChildInternal(newChild: Expression): SimhashKeys =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash_keys"
}

object SimhashKeys {
  /** Lexicographic combinations, cached per geometry — deterministic,
    * so the order is the one the parity spec and any SQL rendering
    * agree on (Scala's `combinations` is lexicographic over a sorted
    * input).
    */
  private val subsetCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Int]]]()

  private[functions] def subsets(blocks: Int, keyBlocks: Int): Array[Array[Int]] =
    subsetCache.computeIfAbsent((blocks, keyBlocks),
      _ => (0 until blocks).combinations(keyBlocks).map(_.toArray).toArray)

  def keys(sig: Long, blocks: Int, keyBlocks: Int, width: Int): ArrayData = {
    val ss = subsets(blocks, keyBlocks)
    val mask = (1L << width) - 1
    val out = new Array[Long](ss.length)
    var i = 0
    while (i < ss.length) {
      val s = ss(i)
      var kv = 0L
      var j = 0
      while (j < s.length) {
        kv |= ((sig >>> (s(j) * width)) & mask) << (j * width)
        j += 1
      }
      out(i) = kv
      i += 1
    }
    new GenericArrayData(out)
  }
}
