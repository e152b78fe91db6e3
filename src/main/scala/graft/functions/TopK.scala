package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-by-key aggregate — the round-16 replacement for the
  * ANN shortlist rank windows (r15 verdict item 1).
  *
  * `graft_topk(score, id, k)` keeps, per group, the k best (score
  * DESC, id ASC) pairs and returns them rank-ordered as
  * `array<struct<id, score>>` — exactly the rows `row_number() OVER
  * (PARTITION BY key ORDER BY score DESC, id) <= k` keeps, minus the
  * sort: the old window plan sorted the ENTIRE candidate set per
  * partition (WindowGroupLimit trims what crosses the exchange, but
  * the per-partition sort below it was the term — 505.5 s vs the
  * 9.7 s hash-aggregate floor over the identical 312 M-row sf10
  * ann_pq candidate frame, PLANS.md r15 addendum).
  *
  * Physical shape is the whole point, so it is pinned by
  * construction, not hoped for:
  *
  *   - NOT a [[org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate]]
  *     (the obvious reach): typed buffers force ObjectHashAggregate,
  *     which disables whole-stage codegen for the stage and falls
  *     back to SORT-BASED aggregation past
  *     `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  *     (default 128) distinct keys per task — with corpus-scaled
  *     query counts that fallback re-introduces the very
  *     candidate-set sort this aggregate exists to delete.
  *   - Instead a plain [[ImperativeAggregate]] over a FIXED-WIDTH
  *     buffer of 2k longs (k (score, id) slots, rank-ordered, empty
  *     slots at the tail) — the HyperLogLogPlusPlus pattern. Fixed
  *     mutable width keeps [[org.apache.spark.sql.execution.aggregate.HashAggregateExec]]
  *     eligible: map-side partial top-k per key, UnsafeRow hash map
  *     with its own spill-to-sort-MERGE path (keys only, never the
  *     candidate rows' scores). Note the stage does NOT stay in
  *     whole-stage codegen: `AggregateCodegenSupport.supportCodegen`
  *     excludes every ImperativeAggregate (HLL++ included), so the
  *     HashAggregateExec containing graft_topk — and the scoring
  *     projection fused into that stage — runs interpreted. That
  *     trade was measured and accepted (r16 bench re-draw: the
  *     bounded-buffer hash aggregate still beats the codegen'd
  *     window plan 3-6× at sf10) — the wins come from deleting the
  *     candidate-set sort and bounding the exchange, not codegen.
  *
  * The exchange then carries at most k slots per (key, map task) —
  * the same volume the WindowGroupLimit partial rank gave — and NO
  * operator anywhere sorts anything candidate-set-sized.
  *
  * Per-row cost: one comparison against the current k-th slot for
  * the common miss; O(k) shifts on a hit. k here is a shortlist
  * width (3-10), bounded at [[TopKPairs.MaxK]] by require.
  *
  * Determinism contract: identical to the window's — (score DESC,
  * id ASC), total order because ids are unique per group in every
  * consumer (candidate-pair uniqueness is spec-pinned). Duplicate
  * (score, id) pairs would each occupy a slot; consumers never
  * produce them. Null score or id: the row is ignored (the window
  * sorted nulls somewhere; shortlist consumers never emit null —
  * the guard is for SQL-surface safety). The one domain restriction:
  * a real input equal to the empty-slot sentinel (score =
  * Long.MinValue AND id = Long.MaxValue) is indistinguishable from
  * empty and drops; e6 cosine scores sit in [-1e6, 1e6], five
  * orders of magnitude inside the sentinel.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ImperativeAggregate with BinaryLike[Expression] {

  require(k >= 1 && k <= TopKPairs.MaxK,
    s"graft_topk: k=$k must be in [1, ${TopKPairs.MaxK}] — the buffer is " +
      "2k longs wide and rides the hash-aggregate fixed-width contract; " +
      "a corpus-scaled k is a different operator")

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (bigint, bigint), got " +
          s"(${s.catalogString}, ${i.catalogString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  // slot layout: [s0, i0, s1, i1, ...] rank-ordered (best first),
  // empty slots = (Long.MinValue, Long.MaxValue) at the tail
  override def aggBufferSchema: StructType = StructType(
    (0 until k).flatMap(j => Seq(
      StructField(s"s$j", LongType, nullable = false),
      StructField(s"i$j", LongType, nullable = false))))

  override val aggBufferAttributes: Seq[AttributeReference] =
    aggBufferSchema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())

  override val inputAggBufferAttributes: Seq[AttributeReference] =
    aggBufferAttributes.map(_.newInstance())

  override def initialize(buffer: InternalRow): Unit = {
    var j = 0
    while (j < k) {
      buffer.setLong(mutableAggBufferOffset + 2 * j, Long.MinValue)
      buffer.setLong(mutableAggBufferOffset + 2 * j + 1, Long.MaxValue)
      j += 1
    }
  }

  /** Insertion into the rank-ordered slots. Sentinel slots compare
    * worse than any real entry under (score DESC, id ASC), so "find
    * my rank, shift the rest down" needs no fill count.
    */
  private def offer(buffer: InternalRow, s: Long, id: Long): Unit = {
    val base = mutableAggBufferOffset
    // common case first: not better than the current k-th slot
    val lastS = buffer.getLong(base + 2 * (k - 1))
    val lastI = buffer.getLong(base + 2 * (k - 1) + 1)
    if (lastS > s || (lastS == s && lastI <= id)) return
    var pos = k - 1
    while (pos > 0 && {
      val ps = buffer.getLong(base + 2 * (pos - 1))
      ps < s || (ps == s && buffer.getLong(base + 2 * (pos - 1) + 1) > id)
    }) pos -= 1
    var j = k - 1
    while (j > pos) {
      buffer.setLong(base + 2 * j, buffer.getLong(base + 2 * (j - 1)))
      buffer.setLong(base + 2 * j + 1, buffer.getLong(base + 2 * (j - 1) + 1))
      j -= 1
    }
    buffer.setLong(base + 2 * pos, s)
    buffer.setLong(base + 2 * pos + 1, id)
  }

  override def update(buffer: InternalRow, input: InternalRow): Unit = {
    val s = scoreExpr.eval(input)
    if (s != null) {
      val id = idExpr.eval(input)
      if (id != null) offer(buffer, s.asInstanceOf[Long], id.asInstanceOf[Long])
    }
  }

  override def merge(buffer: InternalRow, inputBuffer: InternalRow): Unit = {
    var j = 0
    while (j < k) {
      val s = inputBuffer.getLong(inputAggBufferOffset + 2 * j)
      val id = inputBuffer.getLong(inputAggBufferOffset + 2 * j + 1)
      if (s == Long.MinValue && id == Long.MaxValue) return // sentinel tail
      offer(buffer, s, id)
      j += 1
    }
  }

  override def eval(buffer: InternalRow): Any = {
    var filled = 0
    while (filled < k && !(
      buffer.getLong(mutableAggBufferOffset + 2 * filled) == Long.MinValue &&
        buffer.getLong(mutableAggBufferOffset + 2 * filled + 1) == Long.MaxValue))
      filled += 1
    val out = new Array[Any](filled)
    var j = 0
    while (j < filled) {
      out(j) = InternalRow(
        buffer.getLong(mutableAggBufferOffset + 2 * j + 1),
        buffer.getLong(mutableAggBufferOffset + 2 * j))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(scoreExpr = newLeft, idExpr = newRight)

  override def prettyName: String = "graft_topk"
}

object TopKPairs {
  /** Shortlist widths are single digits; the bound keeps the
    * fixed-width buffer honest (2k longs per live group in the hash
    * map) — far above any shipped k (3-10), far below anything that
    * should be an aggregation strategy decision instead.
    */
  val MaxK = 1024

  /** Column-API constructor (the IvfRoute bridge pattern — usable
    * where operators hold Columns, not SQL strings).
    */
  def column(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(TopKPairs(
      GraftColumnBridge.expression(score),
      GraftColumnBridge.expression(id), k).toAggregateExpression())
  }
}
