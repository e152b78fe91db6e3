package graft

import graft.operators.ApproxOps

class ApproxOpsSpec extends SparkSpec {

  private def registersByType(): Map[String, Map[Long, Long]] =
    ApproxOps.sketchHll(spark, sfDir).collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (et, rows) =>
        et -> rows.map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("max_rho")).toMap
      }

  test("sketch_hll estimates per-type distinct users within HLL error bounds") {
    val sketches = registersByType()
    assert(sketches.nonEmpty)
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    sketches.foreach { case (et, regs) =>
      val est = ApproxOps.estimate(regs)
      val ex = exact(et).toDouble
      assert(math.abs(est - ex) / ex <= 0.15,
        s"$et: estimate $est vs exact $ex exceeds 15%")
    }
  }

  test("sketch_hll registers MERGE into the union sketch (the incremental-count property)") {
    val sketches = registersByType().values.toSeq
    val merged = ApproxOps.merge(sketches)
    // register-wise max is idempotent and order-insensitive
    assert(ApproxOps.merge(Seq(merged, merged)) == merged)
    assert(ApproxOps.merge(sketches.reverse) == merged)
    val globalExact = Tables.events(spark, sfDir)
      .select("user_id").distinct().count().toDouble
    val est = ApproxOps.estimate(merged)
    assert(math.abs(est - globalExact) / globalExact <= 0.15,
      s"merged estimate $est vs exact $globalExact exceeds 15%")
  }

  test("sketch_topk equals the naive exact heavy-hitter computation") {
    import org.apache.spark.sql.functions._
    val sketched = ApproxOps.sketchTopk(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("c"))
    assert(sketched.nonEmpty, "no heavy hitters at the 2% threshold — vacuous")
    val tok = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
    val n = tok.count()
    val naive = tok.groupBy("t").agg(count(lit(1)).cast("long").as("c"))
      .filter(col("c") * 50 >= n)
      .orderBy("t").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("c"))
    assert(sketched.sameElements(naive),
      "Misra-Gries pruning changed the result — the candidate set lost a true heavy hitter")
  }

  test("sketch_quantile: histogram form reproduces the positional percentiles exactly") {
    val hist = ApproxOps.sketchQuantile(spark, sfDir).collect()
    val positional = graft.operators.Analytics.qPercentiles(spark, sfDir).collect()
    assert(hist.length == positional.length && hist.nonEmpty)
    hist.zip(positional).foreach { case (h, p) =>
      assert(h.toSeq == p.toSeq, s"histogram=${h.toSeq} positional=${p.toSeq}")
    }
    // and the ordered pass runs over BINS, not rows
    val bins = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.expr("CAST(value AS DECIMAL(18,2))")).distinct().count()
    val rows = Tables.events(spark, sfDir).count()
    assert(bins < rows, s"bins=$bins should compress rows=$rows")
  }

  test("sketch_hll plan: one hash shuffle, register-bounded output") {
    val df = ApproxOps.sketchHll(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
    // at most types x m register rows regardless of input cardinality
    val types = Tables.events(spark, sfDir).select("event_type").distinct().count()
    assert(df.count() <= types * ApproxOps.HllBuckets)
  }
}
