package graft

import graft.operators.ApproxOps

/** Seeded generative checks for the newest primitives: the native
  * `graft_maxrun` fold against a plain-Scala reference over random
  * arrays (runs, nulls, empties, singletons — shapes the corpus can't
  * force), and the KMV bottom-k merge's monoid laws over random hash
  * sets. Deterministic seeds — a failure replays exactly.
  */
class FunctionsPropertySpec extends SparkSpec {

  private def refMaxRun(xs: Seq[Option[String]]): Long = {
    var best = 0L; var run = 0L; var prev: Option[String] = None
    xs.foreach {
      case None => run = 0L; prev = None
      case some @ Some(x) =>
        run = if (prev.contains(x)) run + 1 else 1L
        best = math.max(best, run); prev = some
    }
    best
  }

  test("graft_maxrun matches the reference fold on 200 seeded random arrays") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    // small alphabet forces runs; occasional nulls break them
    val cases = Seq.fill(200) {
      Seq.fill(rnd.nextInt(30)) {
        if (rnd.nextInt(10) == 0) None
        else Some(("a" + rnd.nextInt(3)).intern())
      }
    } :+ Seq.empty[Option[String]] :+ Seq(Some("x")) :+ Seq(None)
    cases.foreach { xs =>
      val lit = xs.map {
        case Some(s) => s"'$s'"
        case None => "CAST(NULL AS STRING)"
      }.mkString(", ")
      val arr = if (xs.isEmpty) "CAST(array() AS array<string>)" else s"array($lit)"
      val got = spark.sql(s"SELECT graft_maxrun($arr)").head().getLong(0)
      assert(got == refMaxRun(xs), s"maxrun mismatch on $xs: got $got")
    }
  }

  test("graft_simhash_keys matches the spelled-out shift/mask concatenation across geometries") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(733)
    val sigs = Seq.fill(30)(rnd.nextLong() & ((1L << 60) - 1)) :+ 0L :+ ((1L << 60) - 1)
    for ((blocks, t, w) <- Seq((10, 4, 6), (10, 5, 6), (6, 1, 10), (5, 2, 12))) {
      // independent reference: lexicographic combinations, spelled out
      // as SQL shift/mask/concat terms — not SimhashKeys.keys itself
      val subsets = (0 until blocks).combinations(t).toSeq
      sigs.foreach { sig =>
        val want = subsets.map { ss =>
          ss.zipWithIndex.map { case (blk, j) =>
            s"((shiftright(${sig}L, ${blk * w}) & ${(1L << w) - 1}) << ${j * w})"
          }.mkString("(", " | ", ")")
        }.mkString("array(", ", ", ")")
        val row = spark.sql(
          s"SELECT graft_simhash_keys(${sig}L, $blocks, $t, $w) AS got, $want AS want").head()
        assert(row.getSeq[Long](0) == row.getSeq[Long](1),
          s"simhash_keys mismatch at ($blocks,$t,$w) sig=$sig")
      }
    }
  }

  test("graft_lsh_buckets matches the spelled-out long_dot formula across geometries") {
    // the pre-native bucketKeysPlan: bands*bits literal-plane dots,
    // bit_j = IF(dot >= 0, 1, 0), bucket_b = sum shiftleft(bit, k).
    // The native pass must be bit-identical on every geometry —
    // including the production bands=8/bits=16 — or the gate oracles
    // and the r11 ScaleKnobs recall rows silently shift.
    graft.functions.GraftFunctions.register(spark)
    val dim = graft.functions.LshBuckets.Dim
    // INDEPENDENT plane derivation — the md5 first-15-hex-digit parse
    // the DuckDB oracle renders (VectorOps.planeDuck) — NOT
    // LshBuckets.planeComponent: deriving the expectation from the
    // code under test would pin only the banding/summing logic, and a
    // plane-recipe regression (beyond the oracle-covered planes 0-15)
    // would pass silently.
    def planeValue(j: Int, i: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${j}_$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2001L - 1000L
    }
    def planeLit(j: Int): String =
      (0 until dim).map(i => s"${planeValue(j, i)}L")
        .mkString("array(", ", ", ")")
    val rnd = new scala.util.Random(1031)
    val vecs = Seq.fill(40)(
      Seq.fill(dim)(rnd.nextInt(20001) - 10000L)) ++
      Seq(Seq.fill(12)(rnd.nextInt(2001) - 1000L), // short vector: prefix rule
        Seq.fill(dim)(0L)) // all-zero: every dot == 0 -> all bits set
    for ((bands, bits) <- Seq((4, 4), (8, 16), (2, 8), (1, 1))) {
      vecs.foreach { v =>
        val arr = v.map(x => s"${x}L").mkString("array(", ", ", ")")
        val spelled = (0 until bands).map { b =>
          (0 until bits).map { k =>
            s"shiftleft(IF(long_dot($arr, ${planeLit(b * bits + k)}) >= 0, " +
              s"CAST(1 AS BIGINT), CAST(0 AS BIGINT)), $k)"
          }.mkString(" + ")
        }.mkString("array(", ", ", ")")
        val row = spark.sql(
          s"SELECT graft_lsh_buckets($arr, $bands, $bits) AS got, $spelled AS want").head()
        assert(row.getSeq[Long](0) == row.getSeq[Long](1),
          s"lsh_buckets mismatch at bands=$bands bits=$bits")
      }
    }
  }

  test("graft_simhash(arr, 60) low 32 bits equal graft_simhash32 (prefix pin)") {
    // the parametric width claims its low-32 prefix IS the gate
    // signature (same per-bit votes) — what makes production (60,4)
    // pairs a strict subset of gate pairs in SimhashSpec's sense
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(271)
    val cases = Seq.fill(100)(
      Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong() & ((1L << 60) - 1))) :+
      Seq(0L) :+ Seq((1L << 60) - 1)
    cases.foreach { hs =>
      val arr = hs.map(h => s"${h}L").mkString("array(", ", ", ")")
      val row = spark.sql(
        s"SELECT graft_simhash($arr, 60) & 4294967295 AS lo, " +
          s"graft_simhash32($arr) AS gate, " +
          s"graft_simhash($arr, 32) AS p32").head()
      assert(row.getLong(0) == row.getLong(1), s"prefix mismatch on $hs")
      assert(row.getLong(2) == row.getLong(1), s"width-32 mismatch on $hs")
    }
  }

  test("kmvMerge is a commutative, associative, idempotent monoid on random sketches") {
    val rnd = new scala.util.Random(7)
    val k = ApproxOps.KmvK
    for (_ <- 1 to 50) {
      // three random "per-partition" sketches drawn from one universe
      // (overlap guaranteed), each already bottom-k'd
      val universe = Seq.fill(200)(rnd.nextLong().abs % 1000000L)
      def sketchOf(s: Seq[Long]) = s.distinct.sorted.take(k)
      val Seq(a, b, c) = Seq.fill(3)(
        sketchOf(rnd.shuffle(universe).take(80 + rnd.nextInt(80))))
      val m = ApproxOps.kmvMerge _
      assert(m(Seq(a, b), k) == m(Seq(b, a), k))
      assert(m(Seq(m(Seq(a, b), k), c), k) == m(Seq(a, m(Seq(b, c), k)), k))
      assert(m(Seq(a, a), k) == a)
      // merge == the sketch of the union (the incremental-count law)
      assert(m(Seq(a, b, c), k) == sketchOf(a ++ b ++ c))
    }
  }

  test("graft_adc_dot equals the declarative aggregate/element_at gather on random tables") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(97)
    val nSub = 8; val nCodes = 16
    val rows = Seq.fill(200)((
      Seq.fill(nSub * nCodes)(rnd.nextLong() % 100000L),
      Seq.fill(nSub)(rnd.nextInt(nCodes).toLong)))
    val df = rows.toDF("adc", "codes")
    val native = s"graft_adc_dot(adc, codes, $nCodes)"
    val decl = graft.operators.VectorOps
      .pqAdcDotDeclarative("adc", "codes", nSub, nCodes)
    assert(df.selectExpr(s"$native AS a", s"$decl AS b")
      .filter("NOT (a <=> b)").count() == 0)
    // too-large code -> NULL (element_at's non-ANSI contract)
    val bad = Seq((Seq.fill(nSub * nCodes)(1L),
      Seq.fill(nSub)(nCodes.toLong))).toDF("adc", "codes")
    assert(bad.selectExpr(s"$native AS a").filter("a IS NULL").count() == 1)
    // NEGATIVE code -> NULL too: here the native gather deliberately
    // diverges from the declarative form (element_at would resolve the
    // negative flat index from the END of the ADC table — an in-bounds
    // read of the wrong cell), so the pin is on NULL, not on parity
    val neg = Seq((Seq.fill(nSub * nCodes)(1L),
      (-1L) +: Seq.fill(nSub - 1)(0L))).toDF("adc", "codes")
    assert(neg.selectExpr(s"$native AS a").filter("a IS NULL").count() == 1)
    // and the expression self-reports nullable even over non-nullable
    // inputs — consumers must keep the isNull check in codegen
    assert(df.selectExpr(s"$native AS a").schema("a").nullable)
  }
}
