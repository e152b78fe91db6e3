package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.operators.VectorOps

/** The bounded top-k-by-key aggregate (graft.functions.TopKPairs) that
  * replaced the ANN shortlist rank windows (round 16, r15 verdict
  * item 1): row-identity against the window it replaced, tie/edge
  * semantics, and the physical-plan contract that motivated it — the
  * shortlist must plan as a HashAggregate with NO sort or window over
  * the candidate set.
  */
class TopKSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def candFrame(rows: Seq[(Long, Long, Long)]) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("q_id", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("score_e6", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_id", LongType, nullable = false)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)).asJava, schema)
  }

  /** Deterministic pseudo-random candidate set: ~40 groups, skewed
    * sizes (group g has g+1 rows), unique n_id per group, colliding
    * scores to exercise the id tie-break.
    */
  private def synthetic(): Seq[(Long, Long, Long)] =
    (0 until 40).flatMap { g =>
      (0 to g).map { i =>
        val h = java.util.Objects.hash(Integer.valueOf(g), Integer.valueOf(i))
        (g.toLong, (h % 7).toLong /* heavy ties */, i.toLong)
      }
    }

  test("graft_topk reproduces the rank window rows, ranks and order") {
    graft.functions.GraftFunctions.register(spark)
    val df = candFrame(synthetic())
    for (k <- Seq(1, 3, 10, 100)) {
      val viaAgg = df.groupBy("q_id")
        .agg(expr(s"graft_topk(score_e6, n_id, $k)").as("tk"))
        .select(col("q_id"), posexplode(col("tk")).as(Seq("r", "s")))
        .select(col("q_id"), (col("r") + 1).cast(LongType).as("rnk"),
          col("s.id").as("n_id"), col("s.score").as("score_e6"))
      val w = Window.partitionBy("q_id").orderBy(col("score_e6").desc, col("n_id"))
      val viaWindow = df.withColumn("rnk", row_number().over(w).cast(LongType))
        .filter(col("rnk") <= k)
        .select("q_id", "rnk", "n_id", "score_e6")
      assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
        s"topk(k=$k) diverged from the rank window")
    }
  }

  test("ties break by ascending id; short groups emit all rows; nulls drop") {
    graft.functions.GraftFunctions.register(spark)
    val df = candFrame(Seq(
      (1L, 5L, 30L), (1L, 5L, 10L), (1L, 5L, 20L), (1L, 7L, 40L),
      (2L, 1L, 9L)))
    val got = df.groupBy("q_id")
      .agg(expr("graft_topk(score_e6, n_id, 3)").as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("r", "s")))
      .select(col("q_id"), col("r"), col("s.id"), col("s.score"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, 0, 40L, 7L), (1L, 1, 10L, 5L), (1L, 2, 20L, 5L),
      (2L, 0, 9L, 1L)))
    // null score or id: the row is ignored, not ranked
    val withNull = df.selectExpr("q_id",
      "CASE WHEN n_id = 40 THEN NULL ELSE score_e6 END AS score_e6", "n_id")
    val gotNull = withNull.groupBy("q_id")
      .agg(expr("graft_topk(score_e6, n_id, 3)").as("tk"))
      .filter(col("q_id") === 1)
      .select(expr("transform(tk, s -> s.id)"))
      .collect().head.getSeq[Long](0)
    assert(gotNull == Seq(10L, 20L, 30L), s"null row should drop, got $gotNull")
  }

  test("the shortlist plans as a HashAggregate — no window, no sort on the score") {
    graft.functions.GraftFunctions.register(spark)
    val v = Scratch.cp(VectorOps.quantizePlan(Tables.embeddings(spark, sfDir)))
    try {
      // the UNSEALED operator plan (the seal's checkpoint would hide
      // everything below it from the executed-plan string)
      val b = VectorOps.bucketedOf(v, 4, 4, keepBandVector = true)
      val topk = VectorOps.lshTopkPlan(b, 4, 3)
      topk.collect()
      val plan = topk.queryExecution.executedPlan.toString.split("Initial Plan")(0)
      assert(plan.contains("graft_topk"), s"expected the topk aggregate:\n$plan")
      assert(!plan.contains("Window"),
        s"a window survived in the shortlist plan:\n$plan")
      assert(!plan.contains("ObjectHashAggregate"),
        s"topk fell off HashAggregateExec (fixed-width buffer contract broken):\n$plan")
      // partial aggregation must run map-side: a partial_graft_topk
      // below the exchange, the final above it
      assert("partial_graft_topk".r.findAllIn(plan).nonEmpty,
        s"no map-side partial top-k:\n$plan")
      // the forbidden shape is a sort KEYED ON THE SCORE (that is what
      // the rank window did to the whole candidate set) — join-key
      // sorts from a sort-merge candidate join are fine and expected
      // at merge-pinned geometries
      val scoreSorts = plan.linesIterator
        .filter(l => l.contains("Sort ") && l.contains("score_e6"))
        .toList
      assert(scoreSorts.isEmpty,
        s"the candidate set is still sorted on the score:\n${scoreSorts.mkString("\n")}\n$plan")
    } finally Scratch.free(v)
  }

  test("builder rejects non-literal or out-of-range k") {
    graft.functions.GraftFunctions.register(spark)
    val df = candFrame(Seq((1L, 1L, 1L)))
    intercept[Exception] {
      df.groupBy("q_id").agg(expr("graft_topk(score_e6, n_id, n_id)")).collect()
    }
    intercept[Exception] {
      df.groupBy("q_id").agg(expr("graft_topk(score_e6, n_id, 0)")).collect()
    }
    intercept[Exception] {
      df.groupBy("q_id").agg(expr("graft_topk(score_e6, n_id, 100000)")).collect()
    }
  }
}
