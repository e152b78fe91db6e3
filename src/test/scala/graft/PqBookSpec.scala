package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{PqBook, PqExprs}
import graft.operators.VectorOps

/** The broadcast-codebook native PQ stages (round 14's scale item —
  * r13 verdict #1): parity of pq_encode / pq_adc_table / pq_rn2 /
  * pq_sub_assign against the literal-SQL formulations they replaced
  * (pqCodesExpr / pqAdcExpr / cn2-gather / pqArgminExpr), at the gate
  * geometry AND at a larger-K geometry with dropped-code holes — the
  * regime the literal plan could not survive at scale. Plus the
  * plan-shape contract the rewire must keep: the probe-side exchange
  * carries the quantized vector, never the M×K ADC table.
  */
class PqBookSpec extends SparkSpec {

  private val dim = 64

  private def quantized(): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Scratch.cp(VectorOps.quantizePlan(Tables.embeddings(spark, sfDir)))
  }

  /** Deterministic codebook over [0, nCodes) with HOLES: every code
    * ≡ 3 (mod 7) is dropped (as a Lloyd loser would be), so the
    * parity runs must agree on hole handling too, not just the happy
    * path.
    */
  private def syntheticCb(nSub: Int, subDim: Int, nCodes: Int): VectorOps.PqCodebook =
    (0 until nSub).map { m =>
      m -> (0 until nCodes).filter(k => k % 7 != 3).map { k =>
        (k.toLong, Seq.tabulate(subDim)(i =>
          ((m * 131L + k * 17L + i * 7L) % 23L) - 11L))
      }.toSeq
    }.toMap

  private def parityAt(nSub: Int, nCodes: Int): Unit = {
    val subDim = dim / nSub
    val cb = syntheticCb(nSub, subDim, nCodes)
    val bc = spark.sparkContext.broadcast(PqBook.build(cb, nSub, subDim, nCodes))
    try {
      val v = quantized()
      try {
        val cn2Lit = VectorOps.pqFlatLit(cb, nSub, nCodes)(cq => cq.map(x => x * x).sum)
        val both = v.select(col("vec_id"), col("q"),
            expr(VectorOps.pqCodesExpr(cb, nSub, subDim)).as("lit_codes"),
            PqExprs.encode(col("q"), bc).as("nat_codes"),
            expr(VectorOps.pqAdcExpr(cb, nSub, subDim, nCodes)).as("lit_adc"),
            PqExprs.adcTable(col("q"), bc).as("nat_adc"))
          .withColumn("lit_rn2", expr(s"graft_adc_dot($cn2Lit, lit_codes, $nCodes)"))
          .withColumn("nat_rn2", PqExprs.rn2(col("nat_codes"), bc))
          // the two ADC scoring representations must gather/compute the
          // IDENTICAL integer: table-lookup vs direct against the book
          .withColumn("gather_dot", expr(s"graft_adc_dot(nat_adc, nat_codes, $nCodes)"))
          .withColumn("direct_dot", PqExprs.dot(col("q"), col("nat_codes"), bc))
        val bad = both.filter(
          col("lit_codes") =!= col("nat_codes") ||
            col("lit_adc") =!= col("nat_adc") ||
            col("lit_rn2") =!= col("nat_rn2") ||
            col("gather_dot") =!= col("direct_dot"))
        assert(both.count() > 0, "empty parity frame")
        assert(bad.count() == 0,
          s"native/literal divergence at M=$nSub K=$nCodes:\n" +
            bad.limit(3).collect().mkString("\n"))
        // the Lloyd assignment arm: per-(m, subvector) rows, the
        // exact generator shape pqLloydStep uses
        val assignCase = (0 until nSub)
          .map(m => s"WHEN $m THEN ${VectorOps.pqArgminExpr(cb, m, "sq")}")
          .mkString("CASE m ", " ", " END")
        val sub = v.select(col("vec_id"), posexplode(expr(
            s"transform(sequence(0, ${nSub - 1}, 1), m -> slice(q, m * $subDim + 1, $subDim))"))
            .as(Seq("m", "sq")))
          .withColumn("lit_code", expr(assignCase))
          .withColumn("nat_code", PqExprs.subAssign(col("m"), col("sq"), bc))
        assert(sub.filter(col("lit_code") =!= col("nat_code")).count() == 0,
          s"pq_sub_assign diverged from the literal argmin at M=$nSub K=$nCodes")
      } finally Scratch.free(v)
    } finally bc.destroy()
  }

  test("native encode/ADC/rn2/assign match the literal-SQL plan at the gate geometry") {
    parityAt(VectorOps.PqSub, VectorOps.PqCodes)
  }

  test("native encode/ADC/rn2 match an independent Scala reference at K=64 with holes") {
    // larger K exercises the regime the literal plan exists to escape
    // — the literal side itself OOMs the codegen compiler here (that
    // IS the r13 finding), so this arm pins against an independent
    // re-spelling of the recipe instead (the IvfRouteSpec pattern)
    val nSub = 8
    val nCodes = 64
    val subDim = dim / nSub
    val cb = syntheticCb(nSub, subDim, nCodes)
    val bc = spark.sparkContext.broadcast(PqBook.build(cb, nSub, subDim, nCodes))
    try {
      val v = quantized()
      try {
        val got = v.select(col("vec_id"),
            col("q"),
            PqExprs.encode(col("q"), bc).as("codes"),
            PqExprs.adcTable(col("q"), bc).as("adc"))
          .withColumn("rn2", PqExprs.rn2(col("codes"), bc))
          .withColumn("ddot", PqExprs.dot(col("q"), col("codes"), bc))
          .collect()
        assert(got.nonEmpty)
        got.foreach { r =>
          val q = r.getSeq[Long](1).toArray
          def subv(m: Int) = q.slice(m * subDim, (m + 1) * subDim)
          def dot(a: Array[Long], b: Array[Long]) =
            a.zip(b).map { case (x, y) => x * y }.sum
          val expCodes = (0 until nSub).map { m =>
            cb(m).minBy { case (code, cq) =>
              (cq.map(x => x * x).sum - 2 * dot(subv(m), cq.toArray), code)
            }._1
          }
          val expAdc = (0 until nSub).flatMap { m =>
            val byCode = cb(m).toMap
            (0 until nCodes).map(k =>
              byCode.get(k.toLong).map(cq => dot(subv(m), cq.toArray)).getOrElse(0L))
          }
          val expRn2 = expCodes.zipWithIndex.map { case (c, m) =>
            cb(m).toMap.apply(c).map(x => x * x).sum }.sum
          assert(r.getSeq[Long](2) == expCodes, s"codes diverged at vec ${r.getLong(0)}")
          assert(r.getSeq[Long](3) == expAdc, s"adc diverged at vec ${r.getLong(0)}")
          assert(r.getLong(4) == expRn2, s"rn2 diverged at vec ${r.getLong(0)}")
          val expDot = expCodes.zipWithIndex.map { case (c, m) =>
            dot(subv(m), cb(m).toMap.apply(c).toArray) }.sum
          assert(r.getLong(5) == expDot, s"pq_dot diverged at vec ${r.getLong(0)}")
        }
      } finally Scratch.free(v)
    } finally bc.destroy()
  }

  test("PqBook.build rejects an empty subspace and out-of-range codes") {
    intercept[IllegalArgumentException] {
      PqBook.build(Map(0 -> Seq.empty), 1, 8, 4)
    }
    intercept[IllegalArgumentException] {
      PqBook.build(Map(0 -> Seq((4L, Seq.fill(8)(1L)))), 1, 8, 4)
    }
  }

  test("ann_pq cell-keyed branch: one cell exchange, direct scoring, no per-row ADC table") {
    // cells >= parallelism (every production sizing): the probe-side
    // repartition on CELL at the index's bucket count IS the
    // sort-merge join's required distribution — the join must add no
    // further exchange on this side — and under the direct scoring
    // rep nothing K-scaled exists at all: the wire and the join sort
    // carry the Dim-long vector, every candidate scores via pq_dot
    // against the broadcast codebook, and pq_adc_table must not
    // appear anywhere (at production K=256 a table-carrying plan
    // paid 16 KB/row through the sort — the r14-r15 probe-stage term)
    graft.functions.GraftFunctions.register(spark)
    val parts = VectorOps.annPqPlan(quantized(), 4, 1, 3,
      lloydIters = 1, pqIters = 1, nSub = VectorOps.PqSub, nCodes = VectorOps.PqCodes)
    try {
      parts.topk.collect()
      val plan = parts.topk.queryExecution.executedPlan.toString.split("Initial Plan")(0)
      assert(plan.contains("pq_dot"),
        s"expected the direct ADC scoring expression in the plan:\n$plan")
      assert(!plan.contains("pq_adc_table"),
        s"the per-probe-row M×K table is back on the production path:\n$plan")
      assert("Exchange hashpartitioning\\(cell".r.findAllIn(plan).length == 1,
        s"the join re-exchanged the probe side (expected the spread repartition " +
          s"to BE the join's cell exchange):\n$plan")
    } finally {
      Scratch.free(parts.assigned)
      parts.dropIndex()
    }
  }

  test("ann_pq small-cells branch keeps the full-parallelism q_id spread") {
    // when cells < shuffle parallelism (gate geometries), the cell
    // keying would cap the heaviest stage at `cells` tasks — measured
    // 38-41 s vs 12-15 s at sf1/cells=16 on 32 cores (r14 A/B). The
    // branch keys the spread on q_id at full parallelism and lets the
    // join add its own cell exchange; under the direct rep that
    // exchange carries the same thin (q_id, cell, q, qn2) rows, so
    // the r14 caveat (ADC tables riding the join's cell exchange on
    // this branch) is structurally gone.
    graft.functions.GraftFunctions.register(spark)
    val parts = VectorOps.annPqPlan(quantized(), 2, 1, 3,
      lloydIters = 1, pqIters = 1, nSub = VectorOps.PqSub, nCodes = VectorOps.PqCodes)
    try {
      parts.topk.collect()
      val plan = parts.topk.queryExecution.executedPlan.toString.split("Initial Plan")(0)
      // the q_id spread must survive (user-specified counts are kept
      // by AQE); the join's own cell exchange is AQE's business at
      // this scale (it may broadcast the tiny corpus side instead —
      // either way the probe side ran at full parallelism, which is
      // the property this branch buys)
      val idxQid = plan.lastIndexOf("Exchange hashpartitioning(q_id")
      assert(idxQid >= 0,
        s"expected the q_id spread exchange:\n$plan")
      assert(plan.contains("pq_dot") && !plan.contains("pq_adc_table"),
        s"expected direct scoring with no per-row ADC table:\n$plan")
    } finally {
      Scratch.free(parts.assigned)
      parts.dropIndex()
    }
  }
}
