package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Driver-built coarse-quantizer routing structure for the IVF family
  * — the fix for the round-12 scale-killer (VERDICT r12 item 3): the
  * old coarse assignment was `vectors CROSS JOIN broadcast(centroids)`
  * → rank-per-vector window, which materializes and SHUFFLES n×cells
  * rows; with the production rule cells ∝ corpus that term is n² (at
  * sf10/cells=1024 it dominated ann_ivf at 1034 s while ann_lsh did
  * 64 s). Routing is row-local here instead — no candidate-row
  * explosion, no window exchange — and hierarchical: probes route
  * through S = ⌈√C⌉ super-centroids, then rank only the member
  * centroids of the best `superProbes` groups, so per-vector work is
  * O(√C·(1 + superProbes·avg-group)) ≈ n·√cells·probes in total
  * instead of n·cells.
  *
  * Layout is flat primitive arrays (the [[LshBuckets]] pattern): the
  * whole structure is O(cells·dim) longs — the classic serving-IVF
  * contract that the coarse quantizer fits in memory on every node
  * (cells ∝ √corpus keeps it ≪ data). It ships as a BROADCAST, not a
  * plan literal, so a 1000-executor cluster fetches it once per
  * executor, never once per task.
  *
  * Determinism contract: super seeds are the first S centroids in
  * cent_id order and every ranking is (score_e6 DESC, cent_id ASC) —
  * exactly the DuckDB-renderable recipe, so the hierarchical path
  * carries its own full oracle (SparkEntry `ann_ivf_hier`), and the
  * flat path (superProbes = 0) reproduces the pre-native
  * crossJoin+window assignment bit-for-bit (spec-pinned).
  */
final class IvfCoarseIndex(
    val dim: Int,
    /** centroid ids ascending — ranking ties break on these */
    val centIds: Array[Long],
    /** C×dim row-major centroid components */
    val centFlat: Array[Long],
    /** per-centroid exact integer norm² (all > 0) */
    val centN2: Array[Long],
    /** indices (into cents) of the S super seeds, ascending */
    val superSeedIdx: Array[Int],
    /** member centroid indices grouped by super, ascending in-group */
    val memberIdx: Array[Int],
    /** S+1 offsets into memberIdx */
    val memberStart: Array[Int]) extends Serializable {

  /** cosine·1e6 fixed-point, IEEE-op-identical to the SQL
    * `CAST(floor(dot / (sqrt(na2)*sqrt(nb2)) * 1000000 + 0.5) AS
    * BIGINT)` every scoreE6 consumer pins (same promote / divide /
    * multiply / add / floor sequence).
    */
  @inline private def scoreE6(dot: Long, na2: Long, nb2: Long): Long =
    math.floor(dot.toDouble /
      (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble)) *
      1000000.0 + 0.5).toLong

  /** Top-`probes` cent_ids for one vector, rank order (score desc,
    * cent_id asc). Flat scan when superProbes <= 0; hierarchical
    * routing otherwise.
    */
  def route(arr: ArrayData, n2: Long, probes: Int, superProbes: Int): ArrayData = {
    val d = math.min(arr.numElements(), dim)
    val vec = new Array[Long](d)
    var i = 0
    while (i < d) { vec(i) = arr.getLong(i); i += 1 }

    @inline def scoreOf(ci: Int): Long = {
      val base = ci * dim
      var acc = 0L
      var x = 0
      while (x < d) { acc += vec(x) * centFlat(base + x); x += 1 }
      scoreE6(acc, n2, centN2(ci))
    }

    // bounded insertion top-k: (score desc, cent_id asc), k = probes
    val nC = centIds.length
    val k = math.min(probes, nC)
    val topIdx = new Array[Int](k)
    val topScore = new Array[Long](k)
    var filled = 0
    def offer(ci: Int): Unit = {
      val s = scoreOf(ci)
      val id = centIds(ci)
      var pos = filled
      while (pos > 0 && {
        val ps = topScore(pos - 1)
        ps < s || (ps == s && centIds(topIdx(pos - 1)) > id)
      }) pos -= 1
      if (pos < k) {
        val last = math.min(filled, k - 1)
        var j = last
        while (j > pos) { topIdx(j) = topIdx(j - 1); topScore(j) = topScore(j - 1); j -= 1 }
        topIdx(pos) = ci
        topScore(pos) = s
        if (filled < k) filled += 1
      }
    }

    if (superProbes <= 0 || superSeedIdx.length >= nC) {
      var ci = 0
      while (ci < nC) { offer(ci); ci += 1 }
    } else {
      // stage 1: rank the S super seeds, keep the best superProbes
      val nS = superSeedIdx.length
      val kS = math.min(superProbes, nS)
      val supSel = new Array[Int](kS)
      val supScore = new Array[Long](kS)
      var supFilled = 0
      var si = 0
      while (si < nS) {
        val s = scoreOf(superSeedIdx(si))
        val id = centIds(superSeedIdx(si))
        var pos = supFilled
        while (pos > 0 && {
          val ps = supScore(pos - 1)
          ps < s || (ps == s && centIds(superSeedIdx(supSel(pos - 1))) > id)
        }) pos -= 1
        if (pos < kS) {
          val last = math.min(supFilled, kS - 1)
          var j = last
          while (j > pos) { supSel(j) = supSel(j - 1); supScore(j) = supScore(j - 1); j -= 1 }
          supSel(pos) = si
          supScore(pos) = s
          if (supFilled < kS) supFilled += 1
        }
        si += 1
      }
      // stage 2: rank only the routed groups' members
      var g = 0
      while (g < supFilled) {
        val sup = supSel(g)
        var m = memberStart(sup)
        val end = memberStart(sup + 1)
        while (m < end) { offer(memberIdx(m)); m += 1 }
        g += 1
      }
      // degenerate-corpus guard: if EVERY probed group is empty (all
      // centroids clustered under unprobed supers — possible with
      // collinear-tied super seeds), fall back to the flat scan
      // rather than emit an empty route. Downstream consumers take
      // element_at(route, 1) / posexplode and would otherwise carry a
      // null cent_id into the Lloyd aggregation or silently drop the
      // vector from the final probe.
      if (filled == 0) {
        var ci = 0
        while (ci < nC) { offer(ci); ci += 1 }
      }
    }

    val out = new Array[Long](filled)
    var r = 0
    while (r < filled) { out(r) = centIds(topIdx(r)); r += 1 }
    new GenericArrayData(out)
  }
}

object IvfCoarseIndex {
  /** Build from collected centroids (cent_id ascending). Super seeds =
    * first ⌈√C⌉ centroids; every centroid joins the super whose seed
    * scores highest against it (score desc, seed cent_id asc) — the
    * same deterministic recipe the `ann_ivf_hier` oracle renders in
    * SQL. Driver cost is C·√C·dim multiplies: O(cells^1.5), trivial
    * under the cells ∝ √corpus sizing rule.
    */
  def build(cents: Array[(Long, Array[Long], Long)], dim: Int): IvfCoarseIndex = {
    val sorted = cents.sortBy(_._1)
    val c = sorted.length
    require(c > 0, "IvfCoarseIndex needs at least one centroid")
    val centIds = sorted.map(_._1)
    val centN2 = sorted.map(_._3)
    val centFlat = new Array[Long](c * dim)
    var ci = 0
    while (ci < c) {
      val cq = sorted(ci)._2
      val n = math.min(cq.length, dim)
      var i = 0
      while (i < n) { centFlat(ci * dim + i) = cq(i); i += 1 }
      ci += 1
    }
    val s = math.min(math.ceil(math.sqrt(c.toDouble)).toInt.max(1), c)
    val superSeedIdx = Array.range(0, s)
    def scoreE6(dot: Long, na2: Long, nb2: Long): Long =
      math.floor(dot.toDouble /
        (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble)) *
        1000000.0 + 0.5).toLong
    def dot(a: Int, b: Int): Long = {
      var acc = 0L
      var i = 0
      while (i < dim) { acc += centFlat(a * dim + i) * centFlat(b * dim + i); i += 1 }
      acc
    }
    val superOf = new Array[Int](c)
    ci = 0
    while (ci < c) {
      var best = 0
      var bestScore = Long.MinValue
      var si = 0
      while (si < s) {
        val sc = scoreE6(dot(ci, superSeedIdx(si)), centN2(ci), centN2(superSeedIdx(si)))
        if (sc > bestScore) { bestScore = sc; best = si }
        // ties: seeds scan ascending, first wins = smaller cent_id
        si += 1
      }
      superOf(ci) = best
      ci += 1
    }
    val counts = new Array[Int](s)
    superOf.foreach(counts(_) += 1)
    val memberStart = new Array[Int](s + 1)
    var g = 0
    while (g < s) { memberStart(g + 1) = memberStart(g) + counts(g); g += 1 }
    val cursor = memberStart.clone()
    val memberIdx = new Array[Int](c)
    ci = 0
    while (ci < c) { // ascending ci → ascending in-group
      val sup = superOf(ci)
      memberIdx(cursor(sup)) = ci
      cursor(sup) += 1
      ci += 1
    }
    new IvfCoarseIndex(dim, centIds, centFlat, centN2, superSeedIdx, memberIdx, memberStart)
  }
}

/** `ivf_route(q, n2)` — array<bigint> of the top-`probes` cell ids for
  * a quantized vector, against a broadcast [[IvfCoarseIndex]]. Not in
  * the [[GraftFunctions]] SQL registry: the expression is constructed
  * programmatically (it carries a Broadcast handle, which a SQL
  * function builder cannot).
  */
case class IvfRoute(left: Expression, right: Expression,
    index: Broadcast[IvfCoarseIndex], probes: Int, superProbes: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ivf_route requires (array<bigint>, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(q: Any, n2: Any): Any =
    index.value.route(q.asInstanceOf[ArrayData],
      n2.asInstanceOf[Long], probes, superProbes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the BROADCAST handle (value() resolved once per task
    // in the constructor-time mutable state), never the index itself —
    // a plan-literal index would re-ship O(cells·dim) with every task
    val bcRef = ctx.addReferenceObj("ivfRouteBc", index,
      classOf[Broadcast[IvfCoarseIndex]].getName)
    val idxCls = classOf[IvfCoarseIndex].getName
    val idxVar = ctx.addMutableState(idxCls, "ivfRouteIdx",
      v => s"$v = ($idxCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (q, n2) =>
      s"${ev.value} = $idxVar.route($q, $n2, $probes, $superProbes);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfRoute =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "ivf_route"
}

object IvfRoute {
  /** Column-API constructor (the programmatic path around the SQL
    * registry).
    */
  def column(q: Column, n2: Column, index: Broadcast[IvfCoarseIndex],
      probes: Int, superProbes: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(IvfRoute(
      GraftColumnBridge.expression(q), GraftColumnBridge.expression(n2),
      index, probes, superProbes))
  }
}
