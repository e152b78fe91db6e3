package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Sketch expressions over a pre-hashed token/shingle array
  * (array<bigint> of portable 60-bit hashes). Native Catalyst
  * expressions with whole-stage codegen: the per-row bit/arithmetic
  * loops run as primitive Java, replacing nested higher-order-function
  * lambda chains whose interpreted dispatch dominated the sketch
  * queries (~30 s → sub-second on the sf0.1 corpus).
  */
private[graft] trait HashArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
}

/** 32-bit SimHash: per bit j, sum +1/-1 votes of bit j over all input
  * hashes (frequency-weighted — duplicates vote repeatedly); bit set
  * iff the vote is positive. Deterministic and engine-portable: the
  * oracle reproduces it with an unnest + SUM + CASE formulation.
  */
case class SimHash32(child: Expression) extends HashArrayExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 32) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      s"""
         |int[] $votes = new int[32];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < 32; $j++) {
         |    $votes[$j] += ((($h >> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  if ($votes[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash32"
}

/** SimHash over the low `bits` bits of the 60-bit token hashes — the
  * PARAMETRIC width behind dedup_simhash's scale knob. The 32-bit
  * gate signature (SimHash32, oracle-pinned) bands 4×8 and its
  * per-band candidate density is ~n²/2⁹ — measured quadratic at sf10
  * (alpha 2.26, PLANS.md round-12 exponent table). The production
  * geometry keeps the SAME 4 bands (pigeonhole: Hamming ≤ 3 still
  * guarantees a matching band) but votes all 60 hash bits, so bands
  * are 15 wide and density drops 2⁷ to ~n²/2¹⁶ per band. The low 32
  * bits of graft_simhash(arr, 60) equal graft_simhash32(arr) by
  * construction (same votes), pinned by spec.
  */
case class SimHashBits(child: Expression, bits: Int) extends HashArrayExpression {
  require(bits >= 1 && bits <= 60,
    s"graft_simhash: bits=$bits must be in [1, 60] (hash60 width)")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashBits.sig(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.SimHashBits.sig($s, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHashBits {
  def sig(hs: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

/** k affine-permutation minhashes over the Mersenne prime 2^31-1:
  * mh_i = min over hashes h of (A_i * (h mod p) + B_i) mod p. Products
  * stay < 2^62 so the arithmetic is exact in any engine. Returns
  * array<bigint> of length k; null input → null, empty array → all-p
  * sentinels (never occurs for non-empty text).
  */
case class MinHashK(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
  extends HashArrayExpression {
  require(as.length == bs.length && as.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill(k)(p)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val hm = hs.getLong(i) % p
      var t = 0
      while (t < k) {
        val v = (as(t) * hm + bs(t)) % p
        if (v < mins(t)) mins(t) = v
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val k = as.length
      val aLit = as.mkString("new long[]{", "L,", "L}")
      val bLit = bs.mkString("new long[]{", "L,", "L}")
      val aArr = ctx.freshName("aArr")
      val bArr = ctx.freshName("bArr")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |long[] $aArr = $aLit;
         |long[] $bArr = $bLit;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${p}L);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $hm = $arr.getLong($i) % ${p}L;
         |  for (int $t = 0; $t < $k; $t++) {
         |    long $v = ($aArr[$t] * $hm + $bArr[$t]) % ${p}L;
         |    if ($v < $mins[$t]) $mins[$t] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashK =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

/** Element-wise portable 60-bit hash of an array<string> — the
  * vectorized form of [[Hash60]]. Replaces
  * `transform(arr, s -> graft_hash60(s))`: Catalyst's higher-order
  * `transform` evaluates its lambda through interpreted dispatch per
  * element even when the inner expression is codegen-capable, which
  * made the per-shingle hash the hot loop of every signature build.
  * Null elements hash to null (never produced by split/shingling).
  */
case class Hash60All(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hash60_all requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    Hash60All.hashAll(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr => s"graft.functions.Hash60All.hashAll($arr)")

  override protected def withNewChildInternal(newChild: Expression): Hash60All =
    copy(child = newChild)

  override def prettyName: String = "graft_hash60_all"
}

object Hash60All {
  def hashAll(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) null
      else java.lang.Long.valueOf(Hash60.hash(arr.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Longest run of equal adjacent elements in an array<string> — the
  * repetition-signal kernel: over raw tokens it is the max
  * consecutive-token run, over a SORTED bigram list it is the mode
  * bigram's occurrence count (sorting groups equal values). Replaces
  * the interpreted `aggregate(arr, struct(prev,run,best), ...)` fold,
  * whose per-element lambda dispatch dominated text_repetition
  * (~9 s → sub-second at sf0.1). Null elements equal nothing (they
  * break runs); an empty array folds to 0.
  */
case class MaxRun(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_maxrun requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    MaxRun.maxRun(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr => s"graft.functions.MaxRun.maxRun($arr)")

  override protected def withNewChildInternal(newChild: Expression): MaxRun =
    copy(child = newChild)

  override def prettyName: String = "graft_maxrun"
}

object MaxRun {
  def maxRun(arr: ArrayData): Long = {
    val n = arr.numElements()
    var best = 0L
    var run = 0L
    var prev: org.apache.spark.unsafe.types.UTF8String = null
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        run = 0L; prev = null
      } else {
        val cur = arr.getUTF8String(i)
        run = if (prev != null && cur.equals(prev)) run + 1 else 1L
        if (run > best) best = run
        prev = cur
      }
      i += 1
    }
    best
  }
}

/** XOR-fold of an array<bigint> (order-insensitive combiner — the
  * document-fingerprint reducer). Replaces the interpreted
  * `aggregate(arr, 0L, (acc, h) -> acc ^ h)` lambda chain with a
  * primitive loop; null elements are skipped (XOR identity), empty or
  * all-null arrays fold to 0.
  */
case class XorFold(child: Expression) extends HashArrayExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) acc ^= arr.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $acc = 0L;
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) $acc ^= $arr.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XorFold =
    copy(child = newChild)

  override def prettyName: String = "graft_xorfold"
}

/** Winnowing selection over an array<bigint> of k-gram hashes:
  * per sliding window of `w` consecutive hashes keep the window
  * MINIMUM, then dedupe preserving first occurrence — numerically
  * identical to
  * `array_distinct(transform(sequence(0, greatest(size(hs)-w, 0)),
  * i -> array_min(slice(hs, i+1, w))))` (spec-pinned), but O(n) via a
  * monotonic deque instead of O(n·w) with a per-window slice
  * allocation inside an interpreted lambda — the text_winnow /
  * dedup_winnow hot loop. A shorter-than-w array yields the min of
  * the whole array (the partial-window rule shared with the oracle);
  * an empty array yields an empty selection.
  */
case class WinnowMins(child: Expression, w: Int) extends HashArrayExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowMins.select(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr => s"graft.functions.WinnowMins.select($arr, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}

object WinnowMins {
  def select(arr: ArrayData, w: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val win = math.min(w, n)
    // monotonic deque of indices: values increase head -> tail, so the
    // head is always the current window's minimum
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1) {
        val mv = java.lang.Long.valueOf(arr.getLong(deque(head)))
        if (seen.add(mv)) out.add(mv)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Asymmetric-distance (ADC) gather-sum for product quantization:
  * given a query's flattened per-subspace lookup table `adc`
  * (nSub × nCodes longs) and a corpus vector's code array `codes`
  * (nSub codes), returns Σ_m adc[m·nCodes + codes[m]] — the PQ
  * approximation of the dot product. Numerically identical to the
  * declarative
  * `aggregate(sequence(0, nSub-1), 0L, (acc, m) ->
  *   acc + element_at(adc, m*nCodes + CAST(element_at(codes, m+1) AS INT) + 1))`
  * (spec-pinned), but a primitive gather loop instead of interpreted
  * lambda dispatch with a sequence allocation PER CANDIDATE PAIR —
  * this runs once per (query, candidate) row of the IVF-PQ shortlist
  * join, the single hottest expression in ann_pq. `nCodes` is
  * plan-time geometry (an integer literal, like graft_winnow's w).
  * Any code outside [0, nCodes) yields NULL. For too-large codes that
  * matches element_at's non-ANSI contract (through the lambda's
  * null-absorbing accumulator); for NEGATIVE codes it deliberately
  * diverges — element_at resolves negative indices from the END of
  * the array, which for a PQ code is always a cross-subspace read of
  * the wrong table cell, never a meaningful answer. The declarative
  * identity is therefore claimed (and spec-pinned) for codes in
  * [0, nCodes) plus the too-large overflow case; negative codes are
  * pinned to NULL by their own spec case.
  */
case class AdcDot(left: Expression, right: Expression, nCodes: Int)
  extends BinaryExpression {

  /** The gather yields NULL on any out-of-range code even when both
    * input arrays are non-nullable (e.g. the re-rank path where the
    * ADC table is a literal array) — without this override the
    * planner would inherit BinaryExpression's input-driven
    * nullability, let codegen consumers skip the isNull flag, and
    * misfold IsNull/IsNotNull over this expression.
    */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_adc_dot requires two array<bigint> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, c: Any): Any =
    AdcDot.gather(a.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], nCodes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = graft.functions.AdcDot.gather($a, $c, $nCodes);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_adc_dot"
}

object AdcDot {
  def gather(adc: ArrayData, codes: ArrayData, nCodes: Int): java.lang.Long = {
    val m = codes.numElements()
    val bound = adc.numElements()
    var acc = 0L
    var i = 0
    while (i < m) {
      // validate the CODE, not just the flat index: a negative code
      // would land inside the previous subspace's table row — in
      // range for the flat bound but semantically garbage (and the
      // spot where element_at's from-the-end negative indexing would
      // silently return a wrong cell; see the class doc)
      val code = codes.getLong(i)
      if (code < 0L || code >= nCodes) return null
      val idx = i.toLong * nCodes + code
      if (idx >= bound) return null
      acc += adc.getLong(idx.toInt)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
