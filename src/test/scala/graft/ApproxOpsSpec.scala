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

  test("sketch_hll_window: trailing-window estimates track exact trailing distincts") {
    import org.apache.spark.sql.functions._
    val win = ApproxOps.sketchHllWindow(spark, sfDir).collect()
    assert(win.nonEmpty)
    // fold rows into per-(type, window-end hour) register maps
    val byWin = win.groupBy(r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("hour")))
      .map { case (k, rs) =>
        k -> rs.map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("win_rho")).toMap
      }
    val w = ApproxOps.HllWindowHours
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts_ms div 3600000").as("hour"),
        col("user_id")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("hour"), r.getAs[Long]("user_id")))
    var checked = 0
    byWin.foreach { case ((et, h), regs) =>
      val exact = ev.filter(e =>
        e._1 == et && e._2 >= h - (w - 1) && e._2 <= h).map(_._3).distinct.length
      if (exact >= 3) {
        // the 15% bound is asymptotic; tiny windows (the sf0.001
        // default corpus tops out at ~5 distinct users per window)
        // sit in the linear-counting regime where one bucket
        // collision moves the estimate by ~1 — allow that absolutely
        val est = ApproxOps.estimate(regs)
        assert(math.abs(est - exact) <= math.max(0.15 * exact, 2.0),
          s"($et, hour $h): estimate $est vs exact trailing-$w-hour $exact out of tolerance")
        checked += 1
      }
    }
    assert(checked > 0, "no window large enough to check — corpus too small")
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

  private def kmvByType(): Map[String, Seq[Long]] =
    ApproxOps.sketchKmv(spark, sfDir).collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (et, rows) => et -> rows.map(_.getAs[Long]("h")).toSeq }

  test("sketch_kmv: bottom-k is exact, mergeable, and estimates within KMV error bounds") {
    val sketches = kmvByType()
    assert(sketches.nonEmpty)
    // exact: each sketch IS the k smallest distinct hashes (re-derived
    // naively in-engine)
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val naive = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("graft_hash60(cast(user_id as string))").as("h"))
      .distinct().collect()
      .groupBy(_.getString(0))
      .map { case (et, rows) =>
        et -> rows.map(_.getAs[Long]("h")).sorted.take(ApproxOps.KmvK).toSeq }
    assert(sketches == naive, "per-partition pruning changed the bottom-k set")
    // estimator: within 2/sqrt(k) ≈ 35% at k=32 (generous CI bound)
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    sketches.foreach { case (et, s) =>
      val est = ApproxOps.kmvEstimate(s)
      val ex = exact(et).toDouble
      assert(math.abs(est - ex) / ex <= 2.0 / math.sqrt(ApproxOps.KmvK),
        s"$et: estimate $est vs exact $ex exceeds the KMV bound")
    }
    // monoid: bottom-k of the union = merge of per-type sketches; the
    // merged estimate tracks the global distinct count
    val merged = ApproxOps.kmvMerge(sketches.values.toSeq)
    assert(merged == ApproxOps.kmvMerge(sketches.values.toSeq.reverse))
    assert(merged == ApproxOps.kmvMerge(Seq(merged, merged)))
    val global = Tables.events(spark, sfDir).select("user_id").distinct().count().toDouble
    val gEst = ApproxOps.kmvEstimate(merged)
    assert(math.abs(gEst - global) / global <= 2.0 / math.sqrt(ApproxOps.KmvK))
    // intersection: every type shares the same user pool here, so the
    // pairwise estimate must be comparable to the per-type counts
    val pair = sketches.values.toSeq.take(2)
    if (pair.length == 2) {
      val iEst = ApproxOps.kmvIntersectEstimate(pair.head, pair(1))
      assert(iEst > 0, "disjoint estimate for overlapping user pools")
    }
    // mixed saturation: an unsaturated sketch sampled its WHOLE set —
    // its threshold is the full hash space, never its largest sample
    // (which would zero out or crash these cases)
    val sat = (1L to ApproxOps.KmvK.toLong).map(_ * 1000L) // saturated
    assert(ApproxOps.kmvIntersectEstimate(Seq(5000L), sat) > 0.0)
    assert(ApproxOps.kmvIntersectEstimate(Seq.empty, sat) == 0.0)
    // both unsaturated = both complete: exact intersection
    assert(ApproxOps.kmvIntersectEstimate(Seq(1L, 2L), Seq(2L, 3L)) == 1.0)
    // saturation is a SIZE fact, not a threshold-value fact: a
    // saturated sketch whose max is 2^60 − 1 (which ROUNDS TO 2^60
    // exactly as a double) must still take the sampling path — the
    // old double-equality sentinel misrouted it to exact-intersection
    val nearTop = ((1L to (ApproxOps.KmvK - 1).toLong).map(_ * 1000L) :+
      ((1L << 60) - 1)) // size == k, max in the rounding neighborhood
    val est = ApproxOps.kmvIntersectEstimate(nearTop, nearTop)
    // sampling path: common = k−1 hashes strictly below θ = 2^60 − 1,
    // scaled by 2^60/θ ≈ 1 → estimate ≈ k−1 from k common elements,
    // NOT the exact |A∩B| = k the misrouted path returns
    assert(est < ApproxOps.KmvK.toDouble,
      s"near-2^60 saturated sketch took the exact-intersection path: $est")
    assert(math.abs(est - (ApproxOps.KmvK - 1)) < 1e-6)
  }

  test("sketch_set_ops: pair estimates track exact distinct intersections within KMV bounds") {
    import org.apache.spark.sql.functions._
    val rows = ApproxOps.sketchSetOps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // exact distinct-user intersections per type pair (the answer the
    // sketch approximates)
    val users = Tables.events(spark, sfDir)
      .select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val full = math.pow(2.0, 60)
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val theta = r.getAs[Long]("theta").toDouble
      val est = r.getAs[Long]("n_common") * full / theta
      val exact = users(ta).intersect(users(tb)).size.toDouble
      // KMV CI is wide at k=32; a generous multiple of the union-size
      // bound still catches a broken θ or intersection rule
      val bound = math.max(4.0 / math.sqrt(ApproxOps.KmvK) * math.max(exact, 1.0), 20.0)
      assert(math.abs(est - exact) <= bound,
        s"($ta,$tb): estimate $est vs exact $exact beyond $bound")
    }
    // and the frame's integers agree with the driver-side estimator on
    // the same sketches (one semantics, two surfaces)
    val sketches = ApproxOps.sketchKmv(spark, sfDir).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("h")).toSeq).toMap
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val est = r.getAs[Long]("n_common") * full / r.getAs[Long]("theta").toDouble
      val driver = ApproxOps.kmvIntersectEstimate(sketches(ta), sketches(tb))
      assert(math.abs(est - driver) < 1e-6,
        s"($ta,$tb): frame estimate $est != driver estimate $driver")
    }
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

  test("sketch_cms: one-sided guarantee (est >= exact for EVERY item), table bounded, mergeable") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val events = Tables.events(spark, sfDir)
    // exact per-(type, user) frequencies — the answer CMS overestimates
    val exact = events.groupBy("event_type", "user_id")
      .agg(count(lit(1)).cast("long").as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("n")).toMap
    // sketch read path: estimate EVERY seen item (not just the gate's
    // bounded probe set) via the same min-over-depth-counters rule
    val sketch = ApproxOps.sketchCms(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("row_i"), r.getAs[Long]("col_i")) ->
        r.getAs[Long]("cnt")).toMap
    val byType = sketch.groupBy(_._1._1).view.mapValues(
      _.map { case ((_, ri, ci), n) => (ri, ci) -> n }.toMap).toMap
    // one read-path semantics, three surfaces: the driver helper here,
    // the oracled sketch_cms_est frame in-engine, and the oracle SQL
    def estimate(et: String, user: Long): Long =
      ApproxOps.cmsEstimate(byType(et), user.toString)
    exact.foreach { case ((et, u), n) =>
      val est = estimate(et, u)
      assert(est >= n, s"CMS UNDER-estimated ($et, $u): est=$est exact=$n")
    }
    // width 64 x depth 4 at this corpus: the mean estimate should not
    // be wildly inflated (collision mass is bounded by n/width per row)
    val inflations = exact.map { case ((et, u), n) => estimate(et, u) - n }
    val total = exact.values.sum
    assert(inflations.sum.toDouble / exact.size <=
      2.0 * ApproxOps.CmsDepth * total / ApproxOps.CmsWidth,
      "mean CMS inflation exceeds the expected collision mass bound")
    // table bounded by groups x depth x width regardless of input
    val types = events.select("event_type").distinct().count()
    assert(sketch.size <= types * ApproxOps.CmsDepth * ApproxOps.CmsWidth)
    // the oracled in-engine read path and the driver helper agree
    ApproxOps.sketchCmsEst(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("est") == estimate(r.getString(0), r.getLong(1)),
        s"frame est disagrees with driver helper at (${r.getString(0)}, ${r.getLong(1)})")
    }
    // merge = counter-wise sum: per-half sketches union into the exact
    // global table (the per-day/per-shard 100 TB property)
    val halves = Seq(events.filter(col("event_id") % 2 === 0),
      events.filter(col("event_id") % 2 === 1)).map { part =>
      ApproxOps.cmsCounters(part).collect()
        .map(r => (r.getString(0), r.getAs[Long]("row_i"), r.getAs[Long]("col_i")) ->
          r.getAs[Long]("cnt")).toMap
    }
    val perType = halves.map(_.groupBy(_._1._1).view.mapValues(
      _.map { case ((_, ri, ci), n) => (ri, ci) -> n }.toMap).toMap)
    val merged = (perType.head.keySet ++ perType(1).keySet).map { et =>
      et -> ApproxOps.cmsMerge(perType.map(_.getOrElse(et, Map.empty)))
    }.toMap
    sketch.foreach { case ((et, ri, ci), n) =>
      assert(merged(et).getOrElse((ri, ci), 0L) == n,
        s"merged halves disagree with the full sketch at ($et, $ri, $ci)")
    }
  }

  test("sketch_cms plan: one hash shuffle for the build; est broadcasts the sketch") {
    val df = ApproxOps.sketchCms(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
    val est = ApproxOps.sketchCmsEst(spark, sfDir)
    val estPlan = est.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(estPlan.contains("BroadcastHashJoin"),
      s"probe-side lookup should broadcast the bounded sketch:\n$estPlan")
  }
}
