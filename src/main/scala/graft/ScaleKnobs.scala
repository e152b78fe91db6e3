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
    // family filter (comma list of minhash|ann_lsh|ann_ivf|ann_pq|
    // components): a single-knob re-measure — e.g. after an LSH
    // hashing change — must not pay the whole 400+ s sweep (whose
    // machine load then pollutes any concurrent bench, as r11's
    // driver artifact showed). Unset = everything.
    val fams = Graft.nameFilter("SPARK_GRAFT_KNOBS_FAMILY")
    def want(f: String): Boolean = fams.forall(_.contains(f))

    // ---------------- minhash: k × bandRows ----------------
    // truth = the exact (df-capped) n-gram Jaccard pairs; recall per
    // Jaccard band shows the LSH theory doing its job: strict
    // geometry keeps the high-j (true duplicate) pairs and sheds the
    // low-j tail that at 100 TB is pure candidate-verify waste.
    if (want("minhash")) {
    val (truth, truthSecs) = timed {
      val t = Scratch.cp(operators.TextOps.dedupNgram(spark, sfDir)
        .select("a_id", "b_id", "jac_e4"))
      t.count(); t
    }
    val bandCounts = Seq(3000L, 6000L, 8000L).map { thr =>
      thr -> truth.filter(col("jac_e4") >= thr).count()
    }
    out += s"| minhash | exact-truth (ngram jac, df-capped) | ${r2(truthSecs)} | " +
      s"${bandCounts.map { case (t, c) => s"j≥$t:$c" }.mkString(" ")} | reference |"
    for ((k, bandRows) <- Seq((8, 2), (64, 4), (128, 8))) {
      val ((nCand, recalls), secs) = timed {
        val cand = Scratch.cp(operators.TextOps
          .minhashCandidatesFullWith(spark, sfDir, k, bandRows)
          .select("a_id", "b_id"))
        val n = cand.count()
        val rec = bandCounts.map { case (thr, total) =>
          val hit = truth.filter(col("jac_e4") >= thr)
            .join(cand, Seq("a_id", "b_id"), "left_semi").count()
          (thr, if (total == 0) 1.0 else hit.toDouble / total)
        }
        Scratch.free(cand)
        (n, rec)
      }
      out += s"| minhash | k=$k r=$bandRows (${k / bandRows} bands) | ${r2(secs)} | $nCand | " +
        recalls.map { case (t, r) => s"recall j≥$t: ${r2(r)}" }.mkString(" ") + " |"
      // NO releaseAll inside this loop — `truth` must stay live across
      // geometries; per-geometry frames are freed individually above
    }
    Scratch.releaseAll()
    }

    // ---------------- ANN: exact baseline once ----------------
    val wantAnn = want("ann_lsh") || want("ann_ivf") || want("ann_pq")
    def quant(): DataFrame =
      Scratch.cp(operators.VectorOps.quantizePlan(Tables.embeddings(spark, sfDir)))
    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val (exact, exactSecs) = if (wantAnn) timed {
      val v = quant()
      val bf = operators.VectorOps.annBruteforceFor(v, v, 3, maxQueries = Long.MaxValue)
      val m = topSets(bf)
      Scratch.free(v)
      m
    } else (Map.empty[Long, Set[Long]], 0.0)
    val nQ = exact.size
    if (wantAnn) {
      out += s"| ann | exact brute-force top-3 ($nQ queries) | ${r2(exactSecs)} | ${nQ.toLong * (nQ - 1)} pairs scored | reference |"
      Scratch.releaseAll()
    }
    def recallOf(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.toSeq.map { case (q, ex) =>
        approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size.max(1)
      }
      per.sum / per.size.max(1)
    }

    // ---------------- ann_lsh: bands × bits ----------------
    if (want("ann_lsh")) for ((bands, bits) <- Seq((4, 4), (8, 8), (8, 16))) {
      val ((nCand, rec), secs) = timed {
        val b = Scratch.cp(operators.VectorOps.bucketed(spark, sfDir, bands, bits,
          keepBandVector = true))
        val n = operators.VectorOps.annLshCandidatesForSpec(b, bands).count()
        val topk = operators.VectorOps.annLshWith(spark, sfDir, bands, bits)
        val r = recallOf(topSets(topk))
        Scratch.free(b)
        (n, r)
      }
      out += s"| ann_lsh | bands=$bands bits=$bits | ${r2(secs)} | $nCand (${r2(nCand.toDouble / nQ)}/query) | recall@3 ${r2(rec)} |"
      Scratch.releaseAll()
    }

    // ---------------- ann_ivf: cells × probes ----------------
    if (want("ann_ivf")) for ((cells, probes) <- Seq((16, 2), (128, 8))) {
      val (rec, secs) = timed {
        recallOf(topSets(operators.VectorOps.annIvfWith(spark, sfDir, cells, probes)))
      }
      out += s"| ann_ivf | cells=$cells probes=$probes | ${r2(secs)} | ~${nQ.toLong * probes / cells.max(1)}/query | recall@3 ${r2(rec)} |"
      Scratch.releaseAll()
    }

    // ---------------- ann_pq: codebook size ----------------
    if (want("ann_pq")) for (nCodes <- Seq(16, 256)) {
      val (rec, secs) = timed {
        recallOf(topSets(operators.VectorOps.annPqOf(
          quant(), 16, 2, 3, 1, 1, nCodes = nCodes)))
      }
      out += s"| ann_pq | M=8 K=$nCodes cells=16 probes=2 | ${r2(secs)} | shortlist=${operators.VectorOps.PqRerank}/query | recall@3 ${r2(rec)} |"
      Scratch.releaseAll()
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
