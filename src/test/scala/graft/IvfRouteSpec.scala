package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{IvfCoarseIndex, IvfRoute}
import graft.operators.VectorOps

/** The hierarchical coarse router (round 13's scale item): unit pins
  * against an independent reference, parity of the routed flat path
  * with the pre-native crossJoin+window plan, the
  * hier-equals-flat-when-all-supers-probed invariant, and recall of
  * real hierarchical routing on a clustered corpus.
  */
class IvfRouteSpec extends SparkSpec {

  private val dim = 64

  private def quantized(): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Scratch.cp(VectorOps.quantizePlan(Tables.embeddings(spark, sfDir)))
  }

  // independent fixed-point cosine — the SQL formula re-spelled, NOT
  // IvfCoarseIndex's private method
  private def refScore(dot: Long, na2: Long, nb2: Long): Long =
    math.floor(dot.toDouble / (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble)) * 1e6 + 0.5).toLong

  private def refDot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("IvfCoarseIndex.build: first-⌈√C⌉ super seeds, exhaustive membership, ascending groups") {
    val rnd = new scala.util.Random(4242)
    for (c <- Seq(1, 2, 3, 16, 17, 100)) {
      val cents = Array.tabulate(c) { i =>
        val cq = Array.fill(dim)(rnd.nextInt(2001) - 1000L)
        (i * 7L, cq, refDot(cq, cq).max(1L))
      }
      val idx = IvfCoarseIndex.build(cents, dim)
      val s = math.ceil(math.sqrt(c.toDouble)).toInt.max(1).min(c)
      assert(idx.superSeedIdx.toSeq == (0 until s), s"super seeds at C=$c")
      assert(idx.memberIdx.sorted.toSeq == (0 until c), s"membership not a partition at C=$c")
      assert(idx.memberStart.length == s + 1 && idx.memberStart.last == c)
      // groups ascending in-index (the tie-break ordering contract)
      for (g <- 0 until s) {
        val grp = idx.memberIdx.slice(idx.memberStart(g), idx.memberStart(g + 1)).toSeq
        assert(grp == grp.sorted, s"group $g not ascending at C=$c")
        // every member's nearest super seed (score desc, seed id asc) IS g
        grp.foreach { ci =>
          val best = (0 until s).minBy { si =>
            val sc = refScore(refDot(cents(ci)._2, cents(si)._2), cents(ci)._3, cents(si)._3)
            (-sc, cents(si)._1)
          }
          assert(best == g, s"centroid $ci grouped to $g, reference says $best (C=$c)")
        }
      }
    }
  }

  test("route: flat and hierarchical match an independent two-stage reference on random data") {
    val rnd = new scala.util.Random(977)
    val c = 36 // S = 6
    val cents = Array.tabulate(c) { i =>
      val cq = Array.fill(dim)(rnd.nextInt(2001) - 1000L)
      (i + 3L, cq, refDot(cq, cq).max(1L))
    }
    val idx = IvfCoarseIndex.build(cents, dim)
    val byId = cents.map(ct => ct._1 -> ct).toMap
    val s = 6
    for (_ <- 1 to 40) {
      val vec = Array.fill(dim)(rnd.nextInt(20001) - 10000L)
      val n2 = refDot(vec, vec).max(1L)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(vec)
      def rank(candIds: Seq[Long], k: Int): Seq[Long] =
        candIds.sortBy { id =>
          val ct = byId(id)
          (-refScore(refDot(vec, ct._2), n2, ct._3), id)
        }.take(k)
      // flat reference
      val flatWant = rank(cents.map(_._1).toSeq, 4)
      val flatGot = idx.route(arr, n2, 4, 0)
        .toLongArray().toSeq
      assert(flatGot == flatWant, "flat route diverged from reference")
      // hierarchical reference: route through first-S super seeds
      for (sp <- Seq(1, 2, 3, 6)) {
        val superIds = (0 until s).map(si => cents(si)._1)
        val routed = rank(superIds, sp) // stage 1 uses the same ordering rule
        val memberIds = (0 until s).filter(g => routed.contains(cents(g)._1))
          .flatMap(g => idx.memberIdx.slice(idx.memberStart(g), idx.memberStart(g + 1)))
          .map(ci => cents(ci)._1)
        val hierWant = rank(memberIds, 4)
        val hierGot = idx.route(arr, n2, 4, sp).toLongArray().toSeq
        assert(hierGot == hierWant, s"hier route diverged at superProbes=$sp")
      }
    }
  }

  test("route: all-probed-groups-empty degenerates to the flat scan, never an empty route") {
    // hand-built index: 4 centroids ALL grouped under super 1; a query
    // whose best super is 0 with superProbes=1 probes only the empty
    // group. The guard must fall back to the flat scan — an empty
    // route would flow a null cent_id into the Lloyd aggregation
    // (element_at(route, 1)) or silently drop the vector (posexplode).
    val d = 4
    val centIds = Array(0L, 1L, 2L, 3L)
    val centFlat = Array[Long](
      1, 0, 0, 0,
      0, 1, 0, 0,
      0, 1, 1, 0,
      0, 1, 0, 1).map(_ * 100L)
    val centN2 = Array.tabulate(4)(i =>
      refDot(centFlat.slice(i * d, i * d + d), centFlat.slice(i * d, i * d + d)))
    val idx = new IvfCoarseIndex(d, centIds, centFlat, centN2,
      superSeedIdx = Array(0, 1),
      memberIdx = Array(0, 1, 2, 3),
      memberStart = Array(0, 0, 4)) // super 0 owns NOTHING
    val vec = Array[Long](100, 1, 0, 0) // best super = 0 (the empty one)
    val n2 = refDot(vec, vec)
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(vec)
    val got = idx.route(arr, n2, 2, 1).toLongArray().toSeq
    val flat = idx.route(arr, n2, 2, 0).toLongArray().toSeq
    assert(got.nonEmpty, "route returned empty on the degenerate grouping")
    assert(got == flat, s"fallback should equal the flat scan: $got vs $flat")
  }

  test("routed flat assignment is row-identical to the declarative crossJoin+window plan") {
    def rows(df: DataFrame): Seq[(Long, Long, Int)] =
      df.select(col("vec_id"), col("cent_id"), col("crnk").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
    for ((cells, probes, iters) <- Seq((16, 2, 1), (32, 4, 1), (8, 3, 0))) {
      val routed = rows(VectorOps.cellAssignmentsOf(quantized(), cells, probes, iters, 0))
      val declarative = rows(VectorOps.cellAssignmentsDeclarative(quantized(), cells, probes, iters))
      assert(routed == declarative, s"divergence at cells=$cells probes=$probes iters=$iters")
      Scratch.releaseAll()
    }
  }

  test("hierarchical routing with every super probed equals flat routing exactly") {
    def rows(df: DataFrame): Seq[(Long, Long, Int)] =
      df.select(col("vec_id"), col("cent_id"), col("crnk").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
    // cells=16 → S=4: superProbes=4 probes every group, so the
    // candidate set is the full centroid table and the rankings must
    // coincide bit-for-bit — a pure routing-correctness invariant
    val flat = rows(VectorOps.cellAssignmentsOf(quantized(), 16, 2, 1, 0))
    val hierAll = rows(VectorOps.cellAssignmentsOf(quantized(), 16, 2, 1, 4))
    assert(flat == hierAll)
    Scratch.releaseAll()
  }

  test("ann_pq over hierarchical-with-all-supers routing matches the flat gate result") {
    def rows(df: DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val flat = rows(VectorOps.annPqOf(quantized(), 16, 2, 3, 1, 1))
    val hier = rows(VectorOps.annPqOf(quantized(), 16, 2, 3, 1, 1, superProbes = 4))
    assert(flat == hier)
    Scratch.releaseAll()
  }

  test("hierarchical recall holds on a clustered corpus (the production superProbes regime)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // 8 well-separated cluster centers ± small jitter — the corpus
    // shape IVF exists for; routing should find the planted structure
    val rnd = new scala.util.Random(20250815)
    val clusters = 8
    val centers = Array.fill(clusters)(Array.fill(dim)(rnd.nextInt(1601) - 800))
    val n = 400
    // jitter is a DETERMINISTIC function of (i, d): quantFrame() is
    // instantiated several times and every instance must hold the
    // identical corpus, or the exact reference and the candidates
    // describe different data
    def emb(i: Long): Seq[Double] = {
      val c = centers((i % clusters).toInt)
      c.indices.map { d =>
        val noise = ((i * 1103515245L + d * 12345L) % 41L) - 20L
        (c(d) + noise) / 1000.0
      }
    }
    def quantFrame() = {
      val df = (0L until n.toLong).map(i => (i, emb(i))).toDF("vec_id", "embedding")
      df.withColumn("q", expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"))
        .withColumn("n2", expr("long_dot(q, q)"))
        .filter(col("n2") > 0)
        .select("vec_id", "q", "n2")
    }
    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSets(VectorOps.annBruteforceFor(quantFrame(), quantFrame(), 3))
    def recall(approx: Map[Long, Set[Long]]): Double =
      exact.map { case (q, ex) =>
        approx.get(q).map(_.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
      }.sum / exact.size
    // 16 cells (S=4), probes=2: flat vs hierarchical superProbes=2 —
    // the PRODUCTION regime (a strict subset of supers probed)
    val flatRecall = recall(topSets(VectorOps.annIvfOf(quantFrame(), 16, 2, 3, 1)))
    val hierRecall = recall(topSets(VectorOps.annIvfOf(quantFrame(), 16, 2, 3, 1, superProbes = 2)))
    assert(hierRecall >= flatRecall - 0.05,
      s"hier recall $hierRecall fell more than 5 points under flat $flatRecall")
    assert(hierRecall >= 0.80, s"hier recall floor: $hierRecall")
    Scratch.releaseAll()
  }

  test("gate corpora never hit the routed flat-scan fallback") {
    // IvfCoarseIndex.route falls back to a flat scan when EVERY probed
    // super group is empty (possible only with colinear-tied super
    // seeds). The DuckDB oracles render the STRICT two-stage route, so
    // a corpus hitting the fallback would silently diverge from the
    // oracle instead of surfacing the dropped-vector bug the fallback
    // fixes (r14 ADVICE). This pins the degeneracy AWAY on the
    // oracle-pinned corpora, both routing stages (seed index at Lloyd
    // assignment, refined index at the final probe), both gated
    // geometries (ann_ivf_hier's 16/2, ann_ivf_prod's ⌈√n⌉/6) — via an
    // independent re-spelling of the stage-1 super ranking over the
    // index's own arrays.
    graft.functions.GraftFunctions.register(spark)
    def scoreE6(dot: Long, a: Long, b: Long): Long =
      math.floor(dot.toDouble /
        (math.sqrt(a.toDouble) * math.sqrt(b.toDouble)) * 1000000.0 + 0.5).toLong
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
        if new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val v = Scratch.cp(VectorOps.quantizePlan(Tables.embeddings(spark, dir)))
      try {
        val rows = v.select("q", "n2").collect()
          .map(r => (r.getSeq[Long](0).toArray, r.getLong(1)))
        val geoms = Seq(
          (16, 2, "ann_ivf_hier"),
          (math.ceil(math.sqrt(rows.length.toDouble)).toInt, 6, "ann_ivf_prod"))
        for ((cells, superProbes, label) <- geoms; iters <- Seq(0, 1)) {
          val cents = VectorOps.refinedCentroidsRouted(v, cells, iters, superProbes)
          val idx = graft.functions.IvfCoarseIndex.build(cents, 64)
          val nS = idx.superSeedIdx.length
          val kS = math.min(superProbes, nS)
          rows.foreach { case (q, n2) =>
            def sup(si: Int): (Long, Long) = { // (score, seed cent_id)
              val ci = idx.superSeedIdx(si)
              var acc = 0L
              var i = 0
              val d = math.min(q.length, idx.dim)
              while (i < d) { acc += q(i) * idx.centFlat(ci * idx.dim + i); i += 1 }
              (scoreE6(acc, n2, idx.centN2(ci)), idx.centIds(ci))
            }
            val probed = (0 until nS).map(si => (si, sup(si)))
              .sortBy { case (_, (s, id)) => (-s, id) }.take(kS).map(_._1)
            assert(probed.exists(si => idx.memberStart(si + 1) > idx.memberStart(si)),
              s"$label@$dir iters=$iters: every probed super group empty — " +
                "the native fallback would fire and diverge from the oracle")
          }
        }
      } finally Scratch.free(v)
    }
    Scratch.releaseAll()
  }

  test("ann_ivf_append ≡ frozen-centroid recompute at full index schema") {
    // the daily-maintenance bar (r15 verdict item 3, the
    // imp_entity_incremental precedent): appending the delta's routed
    // rows under the EXISTING corpus-trained centroids must be
    // row-identical to routing EVERY vector under those same frozen
    // centroids — re-derived here independently of the operator
    graft.functions.GraftFunctions.register(spark)
    val all = Tables.embeddings(spark, sfDir)
    val corpus = Scratch.cp(
      VectorOps.quantizePlan(all.filter(col("vec_id") % 10 =!= 7)))
    try {
      val cents = VectorOps.refinedCentroidsRouted(corpus, 16, 1, 0)
      val bc = spark.sparkContext.broadcast(IvfCoarseIndex.build(cents, dim))
      try {
        val recompute = VectorOps.quantizePlan(all)
          .select(col("vec_id"),
            element_at(IvfRoute.column(col("q"), col("n2"), bc, 1, 0), 1).as("cell"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        val appended = VectorOps.annIvfAppend(spark, sfDir)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        assert(appended.nonEmpty, "empty appended index")
        assert(appended.toSeq == recompute.toSeq,
          "append diverged from the frozen-centroid recompute")
        // the delta really is in the index (the % 10 = 7 arrivals)
        assert(appended.exists(_._1 % 10 == 7), "delta rows missing from the index")
      } finally bc.destroy()
    } finally Scratch.free(corpus)
  }

  test("ann_pq_append ≡ frozen-model recompute at full index schema (codes and rn2 included)") {
    // the index-maintenance triangle's third side (r17 verdict item 4):
    // appending the delta's encoded rows under the EXISTING
    // corpus-trained coarse centroids AND PQ codebooks must be
    // row-identical to routing + encoding EVERY vector under those
    // same frozen models — the gate proves the projected schema via
    // the SQL recompute; this pins the full array-typed index row
    graft.functions.GraftFunctions.register(spark)
    val all = Tables.embeddings(spark, sfDir)
    val corpus = Scratch.cp(
      VectorOps.quantizePlan(all.filter(col("vec_id") % 10 =!= 7)))
    try {
      val cents = VectorOps.refinedCentroidsRouted(corpus, 16, 1, 0)
      val bc = spark.sparkContext.broadcast(IvfCoarseIndex.build(cents, dim))
      try {
        val routed = Scratch.cp(VectorOps.pqRoutedOf(corpus, bc))
        try {
          var cb = VectorOps.pqSeedsOf(routed,
            VectorOps.PqSubDim, VectorOps.PqSub, VectorOps.PqCodes)
          cb = VectorOps.pqLloydStep(routed, cb,
            VectorOps.PqSub, VectorOps.PqSubDim, VectorOps.PqCodes)
          val book = spark.sparkContext.broadcast(graft.functions.PqBook.build(
            cb, VectorOps.PqSub, VectorOps.PqSubDim, VectorOps.PqCodes))
          try {
            def rows(df: DataFrame): Set[String] =
              df.select(col("n_id"), col("cell"),
                  col("codes").cast("string"), col("rn2"))
                .collect().map(_.toSeq.mkString("|")).toSet
            val appended = rows(VectorOps.appendPqIndex(
              VectorOps.pqIndexOf(routed, book),
              all.filter(col("vec_id") % 10 === 7), bc, book))
            val recompute = rows(VectorOps.pqIndexOf(
              VectorOps.pqRoutedOf(VectorOps.quantizePlan(all), bc), book))
            assert(appended.nonEmpty, "empty appended PQ index")
            assert(appended == recompute,
              "PQ append diverged from the frozen-model recompute")
            assert(appended.exists(_.split('|').head.toLong % 10 == 7),
              "delta rows missing from the PQ index")
          } finally book.destroy()
        } finally Scratch.free(routed)
      } finally bc.destroy()
    } finally Scratch.free(corpus)
  }
}
