package graft

import org.apache.spark.sql.functions._
import graft.operators.{KnownWindow, VectorOps}

/** The KNOWN-WINDOW broadcast guard (r15 verdict item 5): the
  * banded/salt-replicated candidate frames carry Generate-
  * underestimated stats; at shipped geometries the factor is
  * adjudicated-bounded and the guard must NOT touch the plan, past
  * the ceiling the replicated side must merge-pin — row-identically.
  */
class KnownWindowSpec extends SparkSpec {

  test("shipped geometries pass through untouched; past-ceiling pins merge") {
    val df = spark.range(10).toDF("x")
    // at-or-under the ceiling: the exact same plan object semantics
    // (no hint node) — shipped geometries stay AQE's business
    assert(KnownWindow.guard(df, 32).queryExecution.logical ==
      df.queryExecution.logical)
    // past it: a merge hint wraps the frame
    val pinned = KnownWindow.guard(df, 33)
    assert(pinned.queryExecution.logical.toString.contains("merge"),
      s"expected a merge hint:\n${pinned.queryExecution.logical}")
  }

  test("a past-ceiling LSH geometry plans shuffle-family and stays row-identical") {
    graft.functions.GraftFunctions.register(spark)
    val v = Scratch.cp(VectorOps.quantizePlan(Tables.embeddings(spark, sfDir)))
    try {
      // bands=16 × salt 4 = 64 > the 32 ceiling → the candidate join
      // must be pinned off the broadcast family
      val b = VectorOps.bucketedOf(v, 16, 2, keepBandVector = true)
      val topk = VectorOps.lshTopkPlan(b, 16, 3)
      val rows = topk.collect()
      val plan = topk.queryExecution.executedPlan.toString.split("Initial Plan")(0)
      assert(!plan.contains("BroadcastHashJoin"),
        s"past-ceiling banded self-join still broadcast-planned:\n$plan")
      assert(rows.nonEmpty, "empty past-ceiling topk — geometry produced no candidates")
      // row-identity vs the same geometry with the guard ineffective:
      // the ceiling is a planner pin, never a semantics change. The
      // unpinned reference runs the identical join shape with hints
      // stripped via a fresh session that broadcasts nothing (the
      // threshold off), which is the plan family the pin forces — so
      // any row difference would be the guard's fault, not AQE's.
      val noBc = spark.newSession()
      noBc.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.functions.GraftFunctions.register(noBc)
      val v2 = Scratch.cp(VectorOps.quantizePlan(Tables.embeddings(noBc, sfDir)))
      try {
        val b2 = VectorOps.bucketedOf(v2, 16, 2, keepBandVector = true)
        val ref = VectorOps.lshTopkPlan(b2, 16, 3).collect()
        assert(rows.map(_.toString).sorted.toSeq == ref.map(_.toString).sorted.toSeq,
          "pinned plan diverged from the no-broadcast reference")
      } finally Scratch.free(v2)
    } finally Scratch.free(v)
  }
}
