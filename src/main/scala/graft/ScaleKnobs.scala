package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production-geometry measurement harness for the detector/ANN scale
  * knobs. The gate oracles pin the SMALL geometries (minhash k=8 ×
  * bandRows=2, LSH 4 bands × 4 bits, PQ K=16) because those keep full
  * DuckDB-expressible oracles at test SF; the 100 TB scaladocs claim
  * the PARAMETRIC paths (k=128/bandRows=8, 16-bit buckets, K=256)
  * shed candidates superlinearly while holding recall on true
  * near-dups. This main MEASURES that claim at a real scale point
  * instead of asserting it: per geometry it records wall seconds,
  * candidate-set size, and recall — minhash against the exact n-gram
  * Jaccard pair truth (per threshold band), ANN against the exact
  * brute-force top-3. Results land in PLANS.md's scale-knob table.
  *
  * Run: SPARK_GRAFT_SF_DIR=testdata/sf1 sbt "runMain graft.ScaleKnobs"
  */
object ScaleKnobs {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def r2(v: Double): String = f"$v%.2f"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val out = Seq.newBuilder[String]
    out += "| family | geometry | secs | candidates | quality |"
    out += "|---|---|---|---|---|"
    // family filter (comma list of minhash|simhash|simhash_xover|
    // ann_lsh|ann_ivf|ann_pq|cluster_rep): a single-knob re-measure — e.g. after an LSH
    // hashing change — must not pay the whole 400+ s sweep (whose
    // machine load then pollutes any concurrent bench, as r11's
    // driver artifact showed). Unset = everything.
    val fams = Graft.nameFilter("SPARK_GRAFT_KNOBS_FAMILY")
    def want(f: String): Boolean = fams.forall(_.contains(f))
    // time-only mode (SPARK_GRAFT_KNOBS_TIME_ONLY=1): skip the exact
    // references (brute-force top-k, n-gram Jaccard truth) and measure
    // wall + candidate density of the PRODUCTION geometries only. This
    // is the ≥sf10 arm: the exact ANN baseline is 4×10^10 pairs at
    // sf10 and the small-corpus gate geometries are by-design
    // quadratic there (the r12 chain measured gate ann_lsh OOM-ing a
    // 8g heap at sf10 — that IS the quadratic smell the production
    // geometry exists to avoid, recorded in PLANS.md). Recall for the
    // production geometries is pinned at sf1, where the exact
    // reference is affordable; ≥sf10 re-measures cost, not quality.
    val timeOnly = sys.env.get("SPARK_GRAFT_KNOBS_TIME_ONLY").contains("1")
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // ---------------- minhash / simhash: shared Jaccard truth ------
    // truth = the exact (df-capped) n-gram Jaccard pairs; recall per
    // Jaccard band shows the LSH theory doing its job: strict
    // geometry keeps the high-j (true duplicate) pairs and sheds the
    // low-j tail that at 100 TB is pure candidate-verify waste.
    val wantTruth = (want("minhash") || want("simhash")) && !timeOnly
    val (truth, truthSecs) = if (wantTruth) timed {
      val t = Scratch.cp(operators.TextOps.dedupNgram(spark, sfDir)
        .select("a_id", "b_id", "jac_e4"))
      t.count(); t
    } else (null: DataFrame, 0.0)
    val bandCounts = if (wantTruth) Seq(3000L, 6000L, 8000L).map { thr =>
      thr -> truth.filter(col("jac_e4") >= thr).count()
    } else Seq.empty
    if (wantTruth)
      out += s"| minhash | exact-truth (ngram jac, df-capped) | ${r2(truthSecs)} | " +
        s"${bandCounts.map { case (t, c) => s"j≥$t:$c" }.mkString(" ")} | reference |"
    def recallRows(cand: DataFrame): Seq[(Long, Double)] =
      bandCounts.map { case (thr, total) =>
        val hit = truth.filter(col("jac_e4") >= thr)
          .join(cand, Seq("a_id", "b_id"), "left_semi").count()
        (thr, if (total == 0) 1.0 else hit.toDouble / total)
      }

    // ---------------- minhash: k × bandRows ----------------
    if (want("minhash") && !timeOnly) {
    for ((k, bandRows) <- Seq((8, 2), (64, 4), (128, 8))) {
      val ((nCand, recalls), secs) = timed {
        val cand = Scratch.cp(operators.TextOps
          .minhashCandidatesFullWith(spark, sfDir, k, bandRows)
          .select("a_id", "b_id"))
        val n = cand.count()
        val rec = recallRows(cand)
        Scratch.free(cand)
        (n, rec)
      }
      out += s"| minhash | k=$k r=$bandRows (${k / bandRows} bands) | ${r2(secs)} | $nCand | " +
        recalls.map { case (t, r) => s"recall j≥$t: ${r2(r)}" }.mkString(" ") + " |"
      // NO releaseAll inside this loop — `truth` must stay live across
      // geometries; per-geometry frames are freed individually above
    }
    }

    // ---------------- simhash: signature width ----------------
    // gate = (32 bits, 4×8 bands), production = (60, 4×15): same d≤3
    // filter and pigeonhole recall argument, 2⁷ lower band density —
    // the alpha=2.26 fix from the round-12 sf10 exponent table.
    // Recall here is against the Jaccard truth like minhash (simhash
    // d≤3 is a different detector than Jaccard; the j≥0.80 row is the
    // "true near-dup" recall that matters). time-only runs production
    // width only and reports density + wall.
    // geometries are (bits, bands, maxHamming): d scales with the
    // signature width — a fixed d on a wider signature is a strictly
    // tighter detector (the (60,4,3) row quantifies that: 56× fewer
    // candidates but recall 0.72-0.78 vs the gate's 0.92-0.95).
    // Production = (60,6,5): d/bits ≈ the gate's operating point,
    // bands = d+1 keeps exact pigeonhole recall.
    val simGeoms =
      if (timeOnly) Seq((60, 6, 5)) else Seq((32, 4, 3), (60, 4, 3), (60, 6, 5))
    if (want("simhash")) for ((bits, bands, d) <- simGeoms) {
      val ((nCand, recalls), secs) = timed {
        val cand = Scratch.cp(operators.TextOps
          .dedupSimhashWith(spark, sfDir, bits, bands, d)
          .select("a_id", "b_id"))
        val n = cand.count()
        val rec = if (timeOnly) Seq.empty else recallRows(cand)
        Scratch.free(cand)
        (n, rec)
      }
      val qual =
        if (timeOnly) "recall pinned at sf1"
        else recalls.map { case (t, r) => s"recall j≥$t: ${r2(r)}" }.mkString(" ")
      out += s"| simhash | bits=$bits bands=$bands d<=$d | ${r2(secs)} | $nCand | $qual |"
    }
    // the sharded (block-combination) arm: same exact-recall pair set
    // as (60,6,d<=5) — spec-pinned identical — so no recall column;
    // what this row measures is the candidate-density trade (210 keys
    // of 24 bits vs 6 of 10) that decides WHERE the banded arm's
    // n²/2^10 verify stage re-dominates (PLANS.md crossover model)
    if (want("simhash")) {
      val (nPairs, secs) = timed {
        val p = Scratch.cp(operators.TextOps
          .dedupSimhashSharded(spark, sfDir)
          .select("a_id", "b_id"))
        val n = p.count()
        Scratch.free(p)
        n
      }
      out += s"| simhash | bits=60 blocks=10 t=4 d<=5 (sharded) | ${r2(secs)} | pairs=$nPairs | pair-identical to (60,6,5) |"
    }
    Scratch.releaseAll()

    // ---------------- simhash banded-vs-sharded crossover ----------
    // The "sharded for ≥10⁶ DIVERSE docs" decision rested on a
    // uniform-collision model (PLANS.md); this family turns the
    // crossover into a measurement (r13 verdict item 8). The bench
    // corpora can't probe it — sf10 is exact-dup-heavy (~100 copies
    // per doc, collapsed by both arms' signature pre-collapse) — so
    // this generates a synthetic corpus of n near-distinct
    // signatures: 8 tokens per doc drawn hash-randomly from a 10⁶
    // vocab. Banded (60,6) pays ~6·n²/2¹¹ random candidate
    // verifications; sharded pays 210 keys/doc up front but its
    // 24-bit keys shed random collisions 2¹⁴ harder. Expect banded to
    // win the small point and lose the 10⁶ one.
    if (want("simhash_xover")) {
      for (nDocs <- Seq(300000L, 1000000L)) {
        val docs = Scratch.cp(spark.range(nDocs).toDF("doc_id")
          .withColumn("text", expr(
            "array_join(transform(sequence(0, 7), i -> " +
              "concat('w', pmod(hash(doc_id * 8 + i), 1000000))), ' ')")))
        def arm(label: String)(body: => DataFrame): Unit = {
          val (nPairs, secs) = timed {
            val p = Scratch.cp(body.select("a_id", "b_id"))
            val n = p.count()
            Scratch.free(p)
            n
          }
          out += s"| simhash_xover | $label n=$nDocs | ${r2(secs)} | pairs=$nPairs | diverse synthetic corpus |"
        }
        arm("banded (60,6,d<=5)")(
          operators.TextOps.dedupSimhashOf(docs, 60, 6, 5))
        arm("sharded (60,10x6,t=4,d<=5)")(
          operators.TextOps.dedupSimhashShardedOf(docs, 60, 10, 4, 5))
        Scratch.free(docs)
        Scratch.releaseAll()
      }
    }

    // ---------------- ngram: cascade-vs-self-join on a duplicate-
    // SPARSE corpus (r17 verdict item 3). The cascade
    // (dedup_ngram_prod) exists for the 100 TB shape — mostly-unique
    // docs, a small true-duplicate fraction — but its only sf10
    // measurement was the duplicate-DENSE bench corpus (every doc has
    // ~100 planted near-dups), the cascade's worst case by
    // construction, where it lost 243 vs 141 s. This family
    // synthesizes the shape the operator exists for: n docs of 40
    // tokens hash-drawn from a SMALL (200-word) vocab — so 3-gram
    // shingles repeat with realistic document frequency and the
    // self-join pays Σ df² pair rows that are almost all Jaccard
    // noise — plus a 2% planted near-dup fraction (one token mutated:
    // 3-gram Jaccard ≈ 0.95, well above the 0.30 detector floor).
    // The self-join's cost tracks shingle collision volume; the
    // cascade's tracks true-duplicate density. Both arms run the
    // SHIPPED plans via the frame-parametric entry points; the
    // cascade's recall vs the exact detector is measured on the same
    // frame (its pinned sf-corpus recall lives in PLANS.md r17).
    if (want("ngram_sparse")) {
      val L = 40; val V = 200
      def synth(idCol: String): String =
        s"array_join(transform(sequence(0, ${L - 1}), j -> " +
          s"concat('w', pmod(hash($idCol * $L + j), $V))), ' ')"
      for (nDocs <- Seq(200000L, 500000L)) {
        val base = spark.range(nDocs).toDF("doc_id")
          .withColumn("text", expr(synth("doc_id")))
        // planted near-dups: doc n+k duplicates doc 50k with token 0
        // mutated — 37 of 39 shared 3-gram shingles, jac ≈ 0.95
        val dups = spark.range(nDocs / 50)
          .select((col("id") * 50).as("src"), (col("id") + nDocs).as("doc_id"))
          .withColumn("text", expr(
            s"array_join(transform(sequence(0, ${L - 1}), j -> " +
              s"IF(j = 0, 'mut', concat('w', pmod(hash(src * $L + j), $V)))), ' ')"))
          .select("doc_id", "text")
        val docs = Scratch.cp(base.unionByName(dups))
        // arm A: the full detector (dedup_ngram's shingle self-join).
        // ngramPairsOf SEALS its result internally (materializes the
        // pair list and frees the capped working set itself — the old
        // extra cp re-checkpointed a sealed frame inside the timed
        // region and double-freed the capped frame, r18 review
        // finding); the arm frees the sealed pair list BY NAME — a
        // releaseAll() here would also drop the `docs` checkpoint arm
        // B still reads (first sweep died with
        // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
        def armFull(): Long = {
          val p = operators.TextOps.ngramPairsOf(
            operators.TextOps.cappedShinglesOf(docs))
          val n = p.count(); Scratch.free(p); n
        }
        // EVERY arm takes one untimed warm pass before its timed one
        // (the mm-family rule, r17 ADVICE): arm A is otherwise the
        // first real job in this fresh knob JVM and absorbs first-run
        // codegen/page-cache costs, biasing the headline A/B ratio in
        // the cascade's favor (r18 review finding)
        // quiesce between warm and timed (the timeOne pattern): the
        // warm pass's freed checkpoints and shuffle files are only
        // reclaimed by the ContextCleaner after a GC, and timing the
        // cleaner's backlog against the next arm is exactly the
        // residue this A/B must not measure
        def quiesce(): Unit = { System.gc(); Thread.sleep(150) }
        armFull(); quiesce()
        val (nTrue, sFull) = timed(armFull())
        out += s"| ngram_sparse | self-join (df<=100) n=$nDocs +2% dups | ${r2(sFull)} | true pairs=$nTrue | sparse synthetic corpus |"
        // arm B: the production cascade (dedup_ngram_prod's plan)
        def armCasc(): (Long, Long) = {
          val cand = operators.TextOps.minhashCandidatesOf(docs, 8, 2)
            .select("a_id", "b_id")
          val nC = cand.count()
          val capped = operators.TextOps.cappedShinglesOf(docs)
          val sets = capped.groupBy("doc_id")
            .agg(collect_list(col("h")).as("hs"))
          val verified = cand
            .join(sets.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
            .join(sets.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
            .withColumn("shared", size(array_intersect(col("ha"), col("hb")))
              .cast("long"))
            .withColumn("jac_e4",
              expr("10000 * shared DIV (size(ha) + size(hb) - shared)"))
            .filter(col("jac_e4") >= 3000)
            .select("a_id", "b_id")
          val v = Scratch.seal(verified, capped)
          val nV = v.count(); Scratch.free(v, cand)
          (nC, nV)
        }
        quiesce(); armCasc(); quiesce()
        val ((nCand, nVer), sCasc) = timed(armCasc())
        val rec =
          if (nTrue == 0) "recall n/a" else s"recall=${r2(nVer.toDouble / nTrue)}"
        out += s"| ngram_sparse | cascade (minhash 4x2 -> array_intersect) n=$nDocs | ${r2(sCasc)} | cand=$nCand verified=$nVer | $rec ratio=${r2(sFull / math.max(sCasc, 1e-9))} |"
        Scratch.free(docs)
        Scratch.releaseAll()
      }
    }

    // ---------------- ANN: exact baseline once ----------------
    val wantAnn = want("ann_lsh") || want("ann_ivf") || want("ann_pq")
    def quant(): DataFrame =
      Scratch.cp(operators.VectorOps.quantizePlan(Tables.embeddings(spark, sfDir)))
    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val (exact, exactSecs) = if (wantAnn && !timeOnly) timed {
      val v = quant()
      val bf = operators.VectorOps.annBruteforceFor(v, v, 3, maxQueries = Long.MaxValue)
      val m = topSets(bf)
      Scratch.free(v)
      m
    } else (Map.empty[Long, Set[Long]], 0.0)
    // time-only: the /query density denominator is the corpus size
    // (every vector is a query in these self-search shapes)
    val nQ = if (timeOnly) {
      if (wantAnn) { val v = quant(); val n = v.count(); Scratch.free(v); n }
      else 0L
    } else exact.size.toLong
    if (wantAnn && !timeOnly) {
      out += s"| ann | exact brute-force top-3 ($nQ queries) | ${r2(exactSecs)} | ${nQ * (nQ - 1)} pairs scored | reference |"
      Scratch.releaseAll()
    }
    def recallOf(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.toSeq.map { case (q, ex) =>
        approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size.max(1)
      }
      per.sum / per.size.max(1)
    }

    // ---------------- ann_lsh: bands × bits ----------------
    // time-only drops the 4-bit gate row: its bucket density is
    // by-design quadratic on big corpora (small-corpus setting).
    // time-only SWEEP ORDER: the production 8×16 row runs FIRST —
    // r14's chain drew it at 220.8 s directly after the 8×8 row's
    // 7.1 G-candidate thrash vs 50.7 s solo on the same HEAD; the row
    // the headline quotes must not inherit the dense row's residue
    val lshGeoms =
      if (timeOnly) Seq((8, 16), (8, 8)) else Seq((4, 4), (8, 8), (8, 16))
    if (want("ann_lsh")) for ((bands, bits) <- lshGeoms) {
      val ((nCand, rec), secs) = timed {
        val b = Scratch.cp(operators.VectorOps.bucketed(spark, sfDir, bands, bits,
          keepBandVector = true))
        val n = operators.VectorOps.annLshCandidatesForSpec(b, bands).count()
        val topk = operators.VectorOps.annLshWith(spark, sfDir, bands, bits)
        val r = if (timeOnly) { noop(topk); -1.0 } else recallOf(topSets(topk))
        Scratch.free(b)
        (n, r)
      }
      val qual = if (timeOnly) "recall pinned at sf1" else s"recall@3 ${r2(rec)}"
      out += s"| ann_lsh | bands=$bands bits=$bits | ${r2(secs)} | $nCand (${r2(nCand.toDouble / nQ)}/query) | $qual |"
      Scratch.releaseAll()
    }

    // ---------------- ann_ivf: cells × probes ----------------
    // the production rule is cells ∝ corpus (annIvfWith scaladoc):
    // per-query candidates = n·probes/cells, so FIXED cells is n²
    // total — the gate's cells=16 measured alpha=2.16 at sf10
    // (PLANS.md exponent table). time-only scales cells to hold the
    // sf1 production slice (~156 vectors/cell at 128 cells / 20k
    // vectors), rounded to a power of two: per-query candidate work
    // is then constant across scale points and the total is linear.
    def cellsForCorpus(n: Long): Int = {
      val target = math.max(128.0, n / 156.0)
      math.pow(2, math.round(math.log(target) / math.log(2)).toDouble).toInt
    }
    // geometry = (cells, probes, superProbes); superProbes=0 is the
    // flat row-local scan, >0 the hierarchical router (round 13).
    // timeOnly measures flat AND hier at production cells — the A/B
    // that shows the assignment term no longer dominating; the sf1
    // (recall) arm sweeps superProbes so the production setting is a
    // MEASURED recall point, not a guess.
    // the third time-only row probes at ann_lsh's CANDIDATE BUDGET
    // (probes=2 at cells∝n ⇒ ~n²·2/cells pair scores ≈ the 8×16-bit
    // LSH row's 442 M at sf10): with assignment killed, the remaining
    // cost is the candidate stage, and cross-operator comparisons are
    // only meaningful at matched candidate counts
    val ivfGeoms =
      if (timeOnly) Seq((cellsForCorpus(nQ), 8, 0), (cellsForCorpus(nQ), 8, 6),
        (cellsForCorpus(nQ), 2, 6))
      else Seq((16, 2, 0), (128, 8, 0), (128, 8, 2), (128, 8, 4), (128, 8, 6))
    if (want("ann_ivf")) for ((cells, probes, superProbes) <- ivfGeoms) {
      val (rec, secs) = timed {
        val topk = operators.VectorOps.annIvfWith(spark, sfDir, cells, probes,
          superProbes = superProbes)
        if (timeOnly) { noop(topk); -1.0 } else recallOf(topSets(topk))
      }
      val qual = if (timeOnly) "recall pinned at sf1" else s"recall@3 ${r2(rec)}"
      val geo = s"cells=$cells probes=$probes" +
        (if (superProbes > 0) s" superProbes=$superProbes (hier)" else " (flat)")
      out += s"| ann_ivf | $geo | ${r2(secs)} | ~${nQ * probes / cells.max(1)}/query | $qual |"
      Scratch.releaseAll()
    }

    // ---------------- ann_pq: codebook size ----------------
    // time-only pairs the big codebook with production cells — the
    // gate's 16 coarse cells put nQ/16×probes candidates on every
    // query, a small-corpus setting like LSH's 4-bit buckets.
    val pqGeoms =
      if (timeOnly) Seq((256, cellsForCorpus(nQ), 8, 0), (256, cellsForCorpus(nQ), 8, 6))
      else Seq((16, 16, 2, 0), (256, 16, 2, 0),
        (256, cellsForCorpus(nQ), 8, 0), (256, cellsForCorpus(nQ), 8, 6))
    if (want("ann_pq")) for ((nCodes, cells, probes, superProbes) <- pqGeoms) {
      val geo = s"M=8 K=$nCodes cells=$cells probes=$probes" +
        (if (superProbes > 0) s" superProbes=$superProbes (hier)" else " (flat)")
      if (timeOnly) {
        // stage A/B in the same single run (the cluster_rep
        // treatment): BUILD = assignment + codebook training + the
        // bucketed index write (all eager inside annPqPlan); PROBE =
        // ADC candidate join + shortlist + exact re-rank + output
        // sort. Attribution tells the next round whether ann_pq is
        // candidate-bound (probe ≈ ann_ivf's residual) or still
        // paying an index-side term.
        val (parts, buildSecs) = timed {
          operators.VectorOps.annPqPlan(quant(), cells, probes, 3, 1, 1,
            operators.VectorOps.PqSub, nCodes, superProbes)
        }
        val (_, probeSecs) = timed {
          noop(parts.topk.orderBy("q_id", "rnk"))
        }
        out += s"| ann_pq | $geo rep=${operators.VectorOps.PqDefaultScoreRep} | ${r2(buildSecs + probeSecs)} | shortlist=${operators.VectorOps.PqRerank}/query | recall pinned at sf1 (build=${r2(buildSecs)} probe=${r2(probeSecs)}) |"
        if (superProbes > 0) {
          // PROBE-STAGE attribution against the ONE build above (r14
          // verdict item 2): join-only streams the candidate join with
          // the scoring pruned away; the score rows force every
          // candidate through each ADC representation and collapse to
          // one aggregate (no shortlist); the shortlist row adds the
          // bounded top-k-by-key aggregate (graft_topk — the r16
          // window replacement, so this row now times the SHIPPED
          // plan); the full-probe rows add the exact re-rank + output
          // sort — both representations, same index.
          def frames(rep: String) = operators.VectorOps.annPqProbeFrames(
            parts.assigned, parts.index, parts.book, cells, probes, 3,
            operators.VectorOps.PqSub, nCodes, rep)
          val (cA, sA, tA) = frames("adc")
          val (cD, _, tD) = frames("direct")
          val (_, joinSecs) = timed { cA.select("q_id", "n_id").count() }
          val (_, scoreASecs) = timed { cA.agg(sum("adc_e6")).collect() }
          val (_, scoreDSecs) = timed { cD.agg(sum("adc_e6")).collect() }
          val (_, shortSecs) = timed { sA.count() }
          val (_, fullASecs) = timed { noop(tA.orderBy("q_id", "rnk")) }
          val (_, fullDSecs) = timed { noop(tD.orderBy("q_id", "rnk")) }
          out += s"| ann_pq | $geo stage probe:join-only (scoring pruned) | ${r2(joinSecs)} | - | attribution |"
          out += s"| ann_pq | $geo stage probe:score rep=adc (M×K table/row) | ${r2(scoreASecs)} | - | attribution |"
          out += s"| ann_pq | $geo stage probe:score rep=direct (no table) | ${r2(scoreDSecs)} | - | attribution |"
          out += s"| ann_pq | $geo stage probe:+shortlist topk-agg rep=adc | ${r2(shortSecs)} | - | attribution |"
          out += s"| ann_pq | $geo full probe rep=adc | ${r2(fullASecs)} | shortlist=${operators.VectorOps.PqRerank}/query | A/B |"
          out += s"| ann_pq | $geo full probe rep=direct | ${r2(fullDSecs)} | shortlist=${operators.VectorOps.PqRerank}/query | A/B |"
        }
        Scratch.free(parts.assigned)
        parts.dropIndex()
      } else {
        val (rec, secs) = timed {
          val topk = operators.VectorOps.annPqOf(
            quant(), cells, probes, 3, 1, 1, nCodes = nCodes,
            superProbes = superProbes)
          recallOf(topSets(topk))
        }
        out += s"| ann_pq | $geo | ${r2(secs)} | shortlist=${operators.VectorOps.PqRerank}/query | recall@3 ${r2(rec)} |"
      }
      Scratch.releaseAll()
    }

    // ---------------- cluster_rep: stage attribution ----------------
    // r12 verdict item 3: dedup_cluster_rep is the one superlinear
    // non-ANN family (alpha 1.23; sf10 192 s vs dedup_components'
    // 66.8). The operator is components ∘ quality-scan ∘ selectReps —
    // time each stage so the exponent has an owner.
    if (want("cluster_rep")) {
      val (_, sComp) = timed {
        noop(operators.Components.dedupComponents(spark, sfDir))
      }
      Scratch.releaseAll()
      val (_, sQual) = timed {
        noop(operators.Components.qualityRank(spark, sfDir))
      }
      Scratch.releaseAll()
      val (_, sFull) = timed {
        noop(operators.Components.dedupClusterRep(spark, sfDir))
      }
      Scratch.releaseAll()
      out += s"| cluster_rep | stage: components | ${r2(sComp)} | - | attribution |"
      out += s"| cluster_rep | stage: quality-scan | ${r2(sQual)} | - | attribution |"
      out += s"| cluster_rep | full (components + quality + selectReps + sort) | ${r2(sFull)} | - | residual=${r2(sFull - sComp - sQual)} |"
    }

    // ---------------- tfidf: shortlist window vs topk floor ----------
    // r16 verdict item 6: textTfidf's per-doc top-5 is the one
    // surviving corpus-scaled rank window — justified because the
    // tie-break key is the term STRING (score_e6 ties are common:
    // many in-doc terms share (tf, df)) and graft_topk slots carry two
    // longs. This A/B measures what a string-capable variant could
    // ever win: the FLOOR arm shortlists via graft_topk on
    // (score_e6, xxhash64(term)) and joins the term rows back — NOT
    // rank-exact on score ties (hash order, not term order), so it is
    // a measurement floor, not a shippable plan. Adoption rule
    // (PLANS.md): build the real variant only if floor ≥ 2× the
    // shipped window.
    if (want("tfidf")) {
      val k = operators.TextOps.TfidfK
      // untimed warm pass (the Bench warmup rule): the first arm would
      // otherwise absorb codegen/scan spinup and skew the A/B
      locally {
        val (topkW, tfW) = operators.TextOps.textTfidfUnsealed(spark, sfDir)
        topkW.count(); Scratch.free(tfW); Scratch.releaseAll()
      }
      val (n1, sWin) = timed {
        val (topk, tf) = operators.TextOps.textTfidfUnsealed(spark, sfDir)
        val n = topk.count(); Scratch.free(tf); n
      }
      Scratch.releaseAll()
      val (n2, sFloor) = timed {
        val (scored0, tf) = operators.TextOps.textTfidfScored(spark, sfDir)
        val scored = scored0.withColumn("tid", xxhash64(col("t")))
        val short = scored.groupBy("doc_id")
          .agg(functions.TopKPairs.column(col("score_e6"), col("tid"), k).as("_tk"))
          .select(col("doc_id"), posexplode(col("_tk")).as(Seq("_r", "_s")))
          .select(col("doc_id"), (col("_r") + 1).as("rnk"), col("_s.id").as("tid"))
        val n = short.join(scored, Seq("doc_id", "tid")).count()
        Scratch.free(tf); n
      }
      Scratch.releaseAll()
      out += s"| tfidf | shipped: WindowGroupLimit top-$k (string tie-break) | ${r2(sWin)} | $n1 rows | A/B |"
      out += s"| tfidf | floor: graft_topk(score,hash)+join-back (tie-order relaxed) | ${r2(sFloor)} | $n2 rows | A/B ratio=${r2(sWin / math.max(sFloor, 1e-9))} |"
    }

    // ---------------- mm: stage attribution + subsampled resize ----
    // r16 verdict item 4: mm_pipeline is the slowest sf10 row and the
    // posture claim is "codec-bound, linear". These rows measure the
    // claim per stage — demux (container parse + sample slicing) vs
    // full-frame decode vs the full pipeline (taps + resize +
    // checksums) — plus the thumbnail-only A/B: full-decode resize vs
    // ImageReadParam.setSourceSubsampling, where the reader
    // materializes 8×8 instead of w×h. Aggregate checksum equality
    // between the two thumb arms is a corpus-wide pixel-parity proof
    // (the per-format parity is also spec-pinned in StreamingSpec).
    if (want("mm")) {
      import spark.implicits._
      def media = operators.Multimodal.mediaTable(spark, sfDir)
      // every stage below RE-SYNTHESIZES the corpus (mediaTable
      // encodes payloads per row — the test corpus ships no
      // binaries), so the synth-only row is the common baseline each
      // stage's delta subtracts. EVERY arm gets one untimed pass
      // before its timed one (r17 ADVICE: warming only the synth arm
      // left each later arm paying its own first-run codegen +
      // page-cache effects, which produced a NEGATIVE demux delta in
      // the committed sf10 table — with per-arm warmup the per-stage
      // deltas are attributable to the stage, not to spinup order)
      def synthArm() = media.map(_.payload.length.toLong).reduce(_ + _)
      def demuxArm() = media.map(r =>
          (operators.Multimodal.demuxOnly(r.payload, r.meta).toLong, 1L))
        .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      def decodeArm() = media
        .map(r => operators.Multimodal.decodeOnly(r.payload, r.meta).toLong)
        .reduce(_ + _)
      def fullArm() = noop(operators.Multimodal.features(spark, sfDir).toDF())
      synthArm()
      val (_, sSynth) = timed { synthArm() }
      demuxArm()
      val ((nSamples, nDocs), sDemux) = timed { demuxArm() }
      decodeArm()
      val (_, sDecode) = timed { decodeArm() }
      fullArm()
      val (_, sFull) = timed { fullArm() }
      out += s"| mm | stage: synthesize+encode only (corpus baseline) | ${r2(sSynth)} | $nDocs docs | attribution |"
      out += s"| mm | stage: +demux (container+slicing; wav=full PCM) | ${r2(sDemux)} | $nSamples samples | demux=${r2(sDemux - sSynth)} |"
      out += s"| mm | stage: +full-frame decode | ${r2(sDecode)} | - | codec=${r2(sDecode - sDemux)} |"
      out += s"| mm | full pipeline (decode+taps+resize+checksums) | ${r2(sFull)} | - | features+resize=${r2(sFull - sDecode)} |"
      // thumbnail-only A/B over the image-format rows (png/jpeg/mp4)
      def thumbs(sub: Boolean) = media
        .filter((r: operators.Multimodal.MediaRow) => r.meta.format != "wav")
        .map(r => operators.Multimodal.thumbOnly(r.payload, r.meta, sub))
      // same per-arm warmup rule as the stage rows above
      thumbs(sub = false).reduce(_ + _)
      val (sumFull: Long, sThumbFull) = timed { thumbs(sub = false).reduce(_ + _) }
      thumbs(sub = true).reduce(_ + _)
      val (sumSub: Long, sThumbSub) = timed { thumbs(sub = true).reduce(_ + _) }
      val parity = if (sumFull == sumSub) "parity: EXACT" else "parity: DIVERGED"
      out += s"| mm | thumb-only: full decode + resize | ${r2(sThumbFull)} | - | A/B |"
      out += s"| mm | thumb-only: subsampled decode (8x8 materialized) | ${r2(sThumbSub)} | - | A/B $parity |"
    }

    // ---------------- components: contraction rounds ----------------
    if (want("components")) {
      val (nLabels, ccSecs) = timed {
        operators.Components.dedupComponents(spark, sfDir).count()
      }
      out += s"| components | large-star/small-star | ${r2(ccSecs)} | $nLabels nodes | rounds=${operators.Components.lastRounds.get()} |"
      Scratch.releaseAll()
    }

    out.result().foreach(println)
    spark.stop()
  }
}
