package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

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

  // combination table resolved once per expression instance / codegen
  // operator (the IvfRoute mutable-state pattern) — the per-row path
  // must never box a (Int, Int) tuple key into the ConcurrentHashMap
  // from inside the very hot loop this expression exists to speed up
  @transient private lazy val ss = SimhashKeys.subsets(blocks, keyBlocks)

  override def nullSafeEval(input: Any): Any =
    SimhashKeys.keys(input.asInstanceOf[Long], ss, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ssVar = ctx.addMutableState("int[][]", "simhashSubsets",
      v => s"$v = graft.functions.SimhashKeys.subsets($blocks, $keyBlocks);")
    defineCodeGen(ctx, ev,
      s => s"graft.functions.SimhashKeys.keys($s, $ssVar, $width)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashKeys =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash_keys"
}

/** `graft_first_simhash_key(sigA, sigB, blocks, keyBlocks, width)` —
  * the index of the FIRST (lexicographic) block combination on which
  * the two signatures agree, or -1 when none does. The sharded dedup
  * join emits a pair only from its first shared key (the banded arm's
  * first-matching-band canonicalization, one level up): without it,
  * an exact-duplicate pair emits once per shared subset —
  * C(blocks,keyBlocks) = 210 emissions at the production geometry —
  * and a dup-heavy corpus (the very thing dedup runs on) quadruples
  * into billions of pre-distinct join rows (observed: the first sf10
  * sharded run ground >10 min in exactly that state).
  *
  * Row-local and cheap: one XOR gives a per-block equality bitmap,
  * then the cached combination table is scanned for the first subset
  * fully inside it.
  */
case class FirstSimhashKey(left: Expression, right: Expression,
    blocks: Int, keyBlocks: Int, width: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_first_simhash_key requires (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = IntegerType

  @transient private lazy val ss = SimhashKeys.subsets(blocks, keyBlocks)

  override def nullSafeEval(a: Any, b: Any): Any =
    SimhashKeys.firstSharedKey(a.asInstanceOf[Long], b.asInstanceOf[Long],
      ss, blocks, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ssVar = ctx.addMutableState("int[][]", "simhashSubsets",
      v => s"$v = graft.functions.SimhashKeys.subsets($blocks, $keyBlocks);")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SimhashKeys.firstSharedKey($a, $b, $ssVar, $blocks, $width);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstSimhashKey =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_first_simhash_key"
}

object SimhashKeys {
  /** Lexicographic combinations, cached per geometry — deterministic,
    * so the order is the one the parity spec and any SQL rendering
    * agree on (Scala's `combinations` is lexicographic over a sorted
    * input).
    */
  private val subsetCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Int]]]()

  /** Resolved ONCE per operator (codegen mutable state) or expression
    * instance (transient lazy val) — never from the per-row loop: the
    * map lookup boxes a tuple key and hashes it, avoidable work in
    * the exact stage the native expressions exist to speed up.
    */
  def subsets(blocks: Int, keyBlocks: Int): Array[Array[Int]] =
    subsetCache.computeIfAbsent((blocks, keyBlocks),
      _ => (0 until blocks).combinations(keyBlocks).map(_.toArray).toArray)

  def firstSharedKey(sigA: Long, sigB: Long,
      ss: Array[Array[Int]], blocks: Int, width: Int): Int = {
    val mask = (1L << width) - 1
    val x = sigA ^ sigB
    // per-block equality bitmap: bit b set iff block b identical
    var eq = 0L
    var b = 0
    while (b < blocks) {
      if (((x >>> (b * width)) & mask) == 0L) eq |= (1L << b)
      b += 1
    }
    var i = 0
    while (i < ss.length) {
      val s = ss(i)
      var ok = true
      var j = 0
      while (ok && j < s.length) { ok = ((eq >>> s(j)) & 1L) == 1L; j += 1 }
      if (ok) return i
      i += 1
    }
    -1
  }

  def keys(sig: Long, ss: Array[Array[Int]], width: Int): ArrayData = {
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
