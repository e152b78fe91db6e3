package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("q1_pricing aggregates lineitem into flag/status groups") {
    val df = Analytics.q1Pricing(spark, sfDir)
    val rows = df.collect()
    assert(rows.length >= 4 && rows.length <= 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02")).count()
    assert(total == expected)
    // decimal strings, not doubles
    assert(rows.head.getAs[String]("sum_qty").matches("""\d+\.\d{2}"""))
  }

  test("q3_shipping returns top-10 by revenue, deterministically ordered") {
    val rows = Analytics.q3Shipping(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(r => BigDecimal(r.getAs[String]("revenue")))
    assert(revs.sameElements(revs.sortBy(x => -x)))
  }

  test("q5_regional has one row per ASIA nation") {
    val rows = Analytics.q5Regional(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 5)
  }

  test("q7_volume returns nation-pair rows restricted to the filter pair") {
    val rows = Analytics.q7Volume(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val pair = Set("NATION_3", "NATION_7")
    assert(rows.forall(r => pair.contains(r.getAs[String]("supp_nation")) &&
      pair.contains(r.getAs[String]("cust_nation")) &&
      r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation")))
    assert(rows.forall(r => (1995L to 1997L).contains(r.getAs[Long]("l_year"))))
  }

  test("q9_profit has one row per (nation, year) and only fixed dims broadcast") {
    val df = Analytics.q9Profit(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.getAs[String]("nation"), r.getAs[Long]("o_year"))).distinct.length == rows.length)
    // the only FORCED broadcast is nation; part/supplier/customer must
    // stay AQE-decided (no hint in the logical plan)
    val logical = df.queryExecution.logical.toString
    val hints = "UnresolvedHint BROADCAST".r.findAllIn(logical).size +
      "ResolvedHint".r.findAllIn(logical).size
    assert(hints <= 1, s"expected <=1 broadcast hint (nation), got $hints:\n$logical")
  }

  test("q18_large_orders keeps only above-threshold orders, no forced hints") {
    val df = Analytics.q18LargeOrders(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => BigDecimal(r.getAs[String]("sum_qty")) > 150))
    assert(rows.map(_.getAs[Long]("o_orderkey")).distinct.length == rows.length)
    val logical = df.queryExecution.logical.toString
    assert(!logical.contains("UnresolvedHint") && !logical.contains("ResolvedHint"),
      s"q18 must leave join strategies to AQE:\n$logical")
  }

  test("q_window_topn keeps at most 3 events per user") {
    val df = Analytics.qWindowTopN(spark, sfDir)
    val worst = df.groupBy("user_id").count().agg(max("count")).head.getLong(0)
    assert(worst <= 3)
  }

  test("q_sessionize events count is preserved") {
    val sessions = Analytics.qSessionize(spark, sfDir)
    val n = sessions.agg(sum("n_events")).head.getLong(0)
    assert(n == Tables.events(spark, sfDir).count())
    // sessions never overlap the >30min gap rule: end >= start
    assert(sessions.filter(col("end_ms") < col("start_ms")).count() == 0)
  }

  test("q_running_total final value equals per-user sum") {
    val rt = Analytics.qRunningTotal(spark, sfDir)
    assert(rt.count() == Tables.events(spark, sfDir).count())
  }

  test("q5 plan: all four dims broadcast, one hash shuffle") {
    val plan = Analytics.q5Regional(spark, sfDir).queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles")
  }

  test("q1 plan: filter is pushed to the parquet scan") {
    val plan = Analytics.q1Pricing(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThanOrEqual(l_shipdate"), s"no pushdown in:\n$plan")
  }

  test("q4_priority: counts cover exactly the flagged in-window orders, no hints") {
    val df = Analytics.q4Priority(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val expected = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .join(Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .count()
    assert(rows.map(_.getAs[Long]("order_count")).sum == expected)
    val logical = df.queryExecution.logical.toString
    assert(!logical.contains("Hint"), s"q4 must stay AQE-decided:\n$logical")
  }

  test("q_pivot: one row per user, cells match the direct filtered sums") {
    val df = Analytics.qPivot(spark, sfDir)
    val rows = df.collect()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.length == users)
    // spot-check one user's click cell against the long-form sum
    val u = rows.head.getAs[Long]("user_id")
    val direct = Tables.events(spark, sfDir)
      .filter(col("user_id") === u && col("event_type") === "click")
      .agg(coalesce(sum(col("value").cast("decimal(18,2)")),
        lit(0).cast("decimal(18,2)")).cast("decimal(38,2)").cast("string"))
      .head.getString(0)
    assert(rows.head.getAs[String]("click") == direct)
    // explicit value list => static schema, no distinct-values job
    assert(df.columns.toSeq == Seq("user_id", "click", "error", "purchase", "signup", "view"))
    // the corpus fills every user×type cell at every SF, so pin the
    // missing-cell zero-fill synthetically: a user with no 'view'
    // events renders '0.00', never null
    import spark.implicits._
    val synth = Seq((1L, "click", 2.5), (1L, "purchase", 4.0), (2L, "view", 1.0))
      .toDF("user_id", "event_type", "value")
    val p = Analytics.qPivotOf(synth).collect()
    val u1 = p.find(_.getAs[Long]("user_id") == 1L).get
    assert(u1.getAs[String]("view") == "0.00" && u1.getAs[String]("error") == "0.00")
    assert(u1.getAs[String]("click") == "2.50" && u1.getAs[String]("purchase") == "4.00")
  }

  test("q_grouping_sets: exactly the two marginals, markers consistent, Expand above the pre-aggregate") {
    val df = Analytics.qGroupingSets(spark, sfDir)
    val rows = df.collect()
    // every row aggregates away exactly one dimension — no combined
    // set, no grand total (the shape rollup/cube cannot express)
    assert(rows.forall(r =>
      r.getAs[Long]("g_status") + r.getAs[Long]("g_priority") == 1))
    // each marginal partitions the full table
    val total = Tables.orders(spark, sfDir).count()
    Seq("g_status", "g_priority").foreach { g =>
      assert(rows.filter(_.getAs[Long](g) == 0L).map(_.getAs[Long]("n")).sum == total)
    }
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    // r18 optimization: the corpus pre-aggregates to the finest
    // grouping BEFORE Expand replicates rows per grouping set, so
    // Expand touches |distinct groups| rows, never the table. Two
    // hash exchanges (finest grouping, then grouping-set keys), both
    // over group-cardinality rows — the scale contract is Expand's
    // input being an aggregate, pinned structurally: Expand's subtree
    // must contain a HashAggregate over the raw scan.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 2, s"expected 2 hash exchanges, got $shuffles:\n$plan")
    val expandSub = plan.split("\\n").dropWhile(l => !l.contains("Expand")).mkString("\n")
    assert(expandSub.contains("HashAggregate"),
      s"Expand must sit above the finest-grouping pre-aggregate:\n$plan")
  }

  test("q_corr_subquery decorrelates to one aggregate + join, matches manual join-back") {
    val df = Analytics.qCorrSubquery(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // no per-row re-scan: the correlated subquery must decorrelate
    // (the optimized plan has NO subquery expression left)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery"),
      s"subquery survived decorrelation:\n$optimized")
    // semantics: matches the manual aggregate + join-back under the
    // same cross-multiplied (division-free) comparison
    val c = Tables.customer(spark, sfDir)
      .withColumn("bal_e4", expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 10000 AS BIGINT)"))
    val avg = c.groupBy("c_nationkey")
      .agg(expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 10000 AS BIGINT)").as("sum_e4"),
        expr("COUNT(*)").as("cnt"))
    val expected = c.join(avg, "c_nationkey")
      .filter(col("bal_e4") * col("cnt") > col("sum_e4"))
      .select("c_custkey").orderBy("c_custkey")
      .collect().map(_.getLong(0)).toSeq
    assert(rows.map(_.getAs[Long]("c_custkey")).toSeq == expected)
  }

  test("q_corr_subquery: a negative-sum nation keeps FLOOR average semantics (no trunc-vs-floor divergence)") {
    // engineered so floor and truncate DISAGREE: nation 1 has 200
    // customers, sum = -66.01 → true avg -3300.5 in e4 space; floor is
    // -3301, truncate-toward-zero is -3300. The 199 customers at -0.33
    // (bal_e4 = -3300) beat the FLOOR average but not the truncated
    // one — exactly the boundary where Spark `div` and an oracle's
    // flooring `//` used to diverge. Cross-multiplication
    // (bal_e4 * cnt > sum_e4) is division-free and floor-equivalent.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_negbal_").toString
    val rows = (1 to 199).map(i => (i.toLong, 1L, -0.33)) ++
      Seq((200L, 1L, -0.34), (201L, 2L, 10.00), (202L, 2L, 20.00))
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.parquet(s"$tmp/customer.parquet")
    val got = Analytics.qCorrSubquery(spark, tmp).collect().map(_.getLong(0)).toSeq
    assert(got == ((1L to 199L) :+ 202L),
      s"floor semantics violated on a negative-sum nation: got ${got.take(5)}…(${got.length} rows)")
  }

  test("q13_custdist: distribution is mass-conserving and keeps zero-order customers") {
    val rows = Analytics.q13Custdist(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nCustomers = Tables.customer(spark, sfDir).count()
    val nOrders = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    // every customer lands in exactly one bucket
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCustomers)
    // total counted orders are conserved through both aggregations
    assert(rows.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum == nOrders)
    // the join-condition filter (vs WHERE) is what keeps the zero
    // bucket: customers without a matching non-urgent order
    val zeroBucket = rows.find(_.getAs[Long]("c_count") == 0L).map(_.getAs[Long]("custdist"))
    val expectedZero = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(zeroBucket.getOrElse(0L) == expectedZero,
      s"zero-order bucket ${zeroBucket} != anti-join count $expectedZero")
  }

  test("q11_share: members clear 1.5x the mean customer spend; subquery is one scalar agg, not a join") {
    val df = Analytics.q11Share(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty, "no customer clears 1.5x mean spend — vacuous")
    val g = Tables.orders(spark, sfDir)
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)").as("t"),
        expr("CAST(COUNT(DISTINCT o_custkey) AS BIGINT)").as("c")).head()
    val (total, custs) = (g.getLong(0), g.getLong(1))
    // semantics: every member clears the cross-multiplied threshold
    rows.foreach(r => assert(r.getAs[Long]("spend_e2") * 2 * custs > 3 * total))
    // and non-members don't (completeness)
    val n = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)").as("s"))
      .filter(col("s") * 2 * custs > 3 * total).count()
    assert(rows.length.toLong == n)
    // plan: the uncorrelated subquery stays a SCALAR subquery (one
    // extra aggregation, its one-row result inlined) — never a join
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("scalar-subquery"), s"expected an inlined scalar subquery:\n$plan")
  }

  test("q_set_ops: set semantics (distinct, no bag counting), matches manual joins") {
    val rows = Analytics.qSetOps(spark, sfDir).collect().map(_.getLong(0))
    assert(rows.nonEmpty, "empty set-op result — vacuous")
    assert(rows.distinct.length == rows.length, "INTERSECT/EXCEPT must emit sets")
    val clicks = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click").select("user_id")
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").select("user_id")
    val severe = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error" && col("value") > 90).select("user_id")
    val manual = clicks.distinct()
      .join(purchases, Seq("user_id"), "left_semi")
      .join(severe, Seq("user_id"), "left_anti")
      .orderBy("user_id").collect().map(_.getLong(0))
    assert(rows.toSeq == manual.toSeq)
  }

  test("q_moving_window: trailing-hour frame is an event-time interval, not a row count") {
    val df = Analytics.qMovingWindow(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == Tables.events(spark, sfDir).count())
    // recompute one user's trailing-hour sums from raw events
    val u = rows.head.getAs[Long]("user_id")
    val ev = Tables.events(spark, sfDir).filter(col("user_id") === u)
      .select("event_id", "ts_ms", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("ts_ms"), r.getAs[Double]("value")))
      .sortBy(_._2)
    val got = rows.filter(_.getAs[Long]("user_id") == u)
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("hour_events")).toMap
    ev.foreach { case (id, ts, _) =>
      val n = ev.count { case (_, t2, _) => t2 >= ts - 3600000L && t2 <= ts }
      assert(got(id) == n, s"event $id: trailing-hour count ${got(id)} != $n")
    }
  }

  test("q_lateral decorrelates and matches the manual window top-1 per nation") {
    val df = Analytics.qLateral(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("LateralJoin") && !optimized.toLowerCase.contains("lateral-subquery"),
      s"lateral survived decorrelation:\n$optimized")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey")
      .orderBy(expr("CAST(c_acctbal AS DECIMAL(18,2))").desc, col("c_custkey"))
    val manual = Tables.customer(spark, sfDir)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"))
      .orderBy("n_name").collect()
      .map(r => (r.getString(0), r.getAs[Long]("c_custkey")))
    assert(rows.map(r => (r.getString(0), r.getAs[Long]("c_custkey"))).toSeq == manual.toSeq)
  }

  test("q_salted_agg is row-identical to the direct groupBy") {
    val salted = Analytics.qSaltedAgg(spark, sfDir).collect()
    val direct = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)")
          .cast("string").as("sum_value"))
      .orderBy("event_type").collect()
    assert(salted.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
  }

  test("q_window_funcs plan: all four window functions share ONE Window operator") {
    // plan contract asserted on the UNSEALED frame (the r18
    // materialize-before-presentation-sort barrier hides the Window
    // behind a checkpoint in the gate entry's own plan)
    val scored = Analytics.qWindowFuncsScored(spark, sfDir)
    val plan = scored.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows == 1, s"expected 1 Window operator, got $windows:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
    // the SEALED gate entry's own plan contract (r18 ADVICE): exactly
    // one range exchange (the presentation sort) directly over the
    // barrier's materialized rows — extra work sneaking in between the
    // seal and the sort would show up as additional operators here
    val sealedPlan = Analytics.qWindowFuncs(spark, sfDir)
      .queryExecution.executedPlan.toString.split("Initial Plan")(0)
    val ranges = "Exchange rangepartitioning".r.findAllIn(sealedPlan).size
    assert(ranges == 1, s"expected 1 range exchange over the seal, got $ranges:\n$sealedPlan")
    assert(!sealedPlan.contains("Exchange hashpartitioning") &&
      "\\bWindow\\b".r.findAllIn(sealedPlan).isEmpty &&
      sealedPlan.contains("ExistingRDD"),
      s"sealed plan must be sort-over-materialized-rows only:\n$sealedPlan")
    // sanity on semantics: quartiles are 1..4 and rank fractions bounded
    val rows = Analytics.qWindowFuncs(spark, sfDir).collect()
    assert(rows.forall(r => (1L to 4L).contains(r.getAs[Long]("quartile"))))
    assert(rows.forall(r => r.getAs[Long]("cume_e6") > 0 && r.getAs[Long]("cume_e6") <= 1000000))
    assert(rows.forall(r => r.getAs[Long]("prank_e6") >= 0 && r.getAs[Long]("prank_e6") <= 1000000))
  }

  test("q6 plan: all three predicates reach the parquet scan, no data shuffle") {
    val plan = Analytics.q6Forecast(spark, sfDir).queryExecution.executedPlan.toString
    // the rendered PushedFilters list truncates, so anchor on its
    // (stable) head plus the Filter node's own predicate text
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate not pushed to the scan in:\n$plan")
    assert(plan.contains("l_quantity") && plan.contains("< 24.0"),
      s"quantity predicate missing in:\n$plan")
    // the only exchange is the single-row partial->final aggregate
    assert(!plan.contains("Exchange hashpartitioning"),
      s"a global-sum query must not hash-shuffle data rows:\n$plan")
  }

  test("q19 plan: disjunctive predicates stay a single equi hash join, never a cartesian") {
    val plan = Analytics.q19Discount(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"OR-predicates degraded the join:\n$plan")
    assert(plan.contains("HashJoin"), s"expected a hash join in:\n$plan")
  }

  test("q22: threshold subquery inlines as one aggregate; anti join keeps only never-ordered") {
    val df = Analytics.q22NoOrders(spark, sfDir)
    val got = df.collect()
    assert(got.nonEmpty, "q22 went vacuous at the spec SF")
    // cross-check one nation against a direct computation
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey", "c_acctbal").collect()
    val pos = c.map(_.getDouble(2)).filter(_ > 0)
    val (s2, n2) = (pos.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum, pos.length)
    val recent = Tables.orders(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("o_orderdate") >= org.apache.spark.sql.functions.lit("2000-01-01"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expect = c.filter(r => BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * n2 > s2)
      .filterNot(r => recent.contains(r.getLong(0)))
      .groupBy(_.getInt(1)).view.mapValues(_.length.toLong).toMap
    val gotMap = got.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotMap == expect, s"got $gotMap want $expect")
  }
}
