package graft

import graft.operators.{TextOps, VectorOps}
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {

  test("text ops are per-row (no shuffle in the plan) and cover all docs") {
    val n = Tables.documents(spark, sfDir).count()
    for (q <- Seq(TextOps.textTokens _, TextOps.textQuality _,
      TextOps.textLangid _, TextOps.textFingerprint _)) {
      val df = q(spark, sfDir)
      assert(df.count() == n)
      // signature computation itself must not shuffle (only the final
      // presentation orderBy may exchange for range partitioning)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    }
  }

  test("text_pii scrubs every email/phone/id-run and counts them") {
    val rows = TextOps.textPii(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every synthesized contact tail carries exactly one of each class
    assert(rows.forall(_.getAs[Long]("n_emails") == 1L))
    assert(rows.forall(_.getAs[Long]("n_phones") == 1L))
    assert(rows.forall(_.getAs[Long]("n_ids") == 1L))
    // and the OPERATOR'S OWN scrubbed column retains none of the raw
    // PII shapes (asserted on textPiiScrubbed, not a re-derived copy —
    // a drifted pattern in the operator must fail here)
    import org.apache.spark.sql.functions.{col, expr}
    val leftover = TextOps.textPiiScrubbed(spark, sfDir)
      .filter(col("scrubbed").contains("@") ||
        expr("scrubbed rlike '[0-9]{7,}'"))
      .count()
    assert(leftover == 0)
  }

  test("text_bigram: scores bounded, known <= total, model bounded by construction") {
    import graft.operators.TextOps
    val rows = TextOps.textBigram(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.length == Tables.documents(spark, sfDir).count())
    assert(rows.forall(r => r.getAs[Long]("n_known") <= r.getAs[Long]("n_bigrams")))
    assert(rows.forall(r => (0L to 10000L).contains(r.getAs[Long]("fluency_e4"))))
    // the >= 0.1%-of-mass cut can admit at most 1000 bigrams — the
    // bound that justifies the broadcast scoring join
    val model = Tables.documents(spark, sfDir)
      .select(explode(expr(TextOps.shinglesExpr(2))).as("b"))
      .groupBy("b").count()
    val total = model.agg(sum("count")).head.getLong(0)
    val kept = model.filter(col("count") * 1000 >= total).count()
    assert(kept <= 1000, s"model exceeded its mathematical bound: $kept")
  }

  test("text_repetition matches a reference Scala recomputation per doc") {
    // the aggregate-fold run-length logic is the risky part — recompute
    // all three signals from the raw text in plain Scala and compare
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def runs(xs: Seq[String]): Long = {
      var best = 0L; var run = 0L; var prev: String = null
      xs.foreach { x =>
        run = if (x == prev) run + 1 else 1L
        best = math.max(best, run); prev = x
      }
      best
    }
    def bigrams(toks: Seq[String]): Seq[String] =
      if (toks.length < 2) Seq(toks.mkString(" "))
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    val rows = TextOps.textRepetition(spark, sfDir).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ", -1).toSeq
      val bgs = bigrams(toks)
      assert(r.getAs[Long]("n_tokens") == toks.length)
      assert(r.getAs[Long]("ttr_e4") == 10000L * toks.distinct.length / toks.length)
      assert(r.getAs[Long]("max_run") == runs(toks))
      val top2 = bgs.groupBy(identity).values.map(_.length.toLong).max
      assert(r.getAs[Long]("top2_e4") == 10000L * top2 / bgs.length)
    }
    // row-local: no shuffle before the presentation sort
    val plan = TextOps.textRepetition(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
  }

  test("pipe_quota: cap enforced per source, longest docs win, WindowGroupLimit below the shuffle") {
    import graft.operators.TrainOps
    val df = TrainOps.pipeQuota(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.length <= TrainOps.QuotaCap))
    // within a source, every kept doc is at least as long as any cut one
    val kept = rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    val all = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars").collect()
    all.groupBy(_.getAs[String]("source")).foreach { case (src, docs) =>
      val keptLens = docs.filter(d => kept((src, d.getAs[Long]("doc_id"))))
        .map(_.getAs[Long]("n_chars"))
      val cutLens = docs.filterNot(d => kept((src, d.getAs[Long]("doc_id"))))
        .map(_.getAs[Long]("n_chars"))
      if (keptLens.nonEmpty && cutLens.nonEmpty)
        assert(keptLens.min >= cutLens.max)
    }
    // the rank<=k filter must plan a WindowGroupLimit under the
    // exchange — a mega-source then ships cap×partitions rows, not all
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("pipe_tokenize: ids are frequency ranks in doc order, recomputed per doc in Scala") {
    import graft.operators.TrainOps
    val rows = TrainOps.pipeTokenize(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length == docs.size)
    // reference vocabulary from plain Scala: top-V pretokens by
    // (count desc, token asc), ids = 1-based ranks
    val re = "[a-z]+|[0-9]+|[^a-z0-9 ]".r
    val allToks = docs.values.toSeq.flatMap(t => re.findAllIn(t).toSeq)
    val vocab = allToks.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(TrainOps.TokenizeVocab)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
    rows.foreach { r =>
      val toks = re.findAllIn(docs(r.getAs[Long]("doc_id"))).toSeq
      val want = toks.map(t => vocab.getOrElse(t, 0L)).mkString(",")
      assert(r.getAs[Long]("n_pretokens") == toks.length)
      assert(r.getAs[String]("ids") == want)
    }
    // the in-vocab share is real (ids aren't all OOV) but OOV exists
    val ids = rows.flatMap(_.getAs[String]("ids").split(",")).map(_.toLong)
    assert(ids.exists(_ > 0) && ids.exists(_ == 0))
    assert(ids.forall(i => i >= 0 && i <= TrainOps.TokenizeVocab))
  }

  test("text_tfidf matches a full Scala recomputation; top-k plans a WindowGroupLimit") {
    import graft.operators.TextOps
    val df = TextOps.textTfidf(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // reference recomputation: tf, df, and the doubled-RSJ integer
    // score in plain Scala (Long math, floorDiv == DIV for positives)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val n = docs.size.toLong
    val dfMap = docs.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val want = docs.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, occ) =>
        val tfv = occ.size.toLong; val dfv = dfMap(t)
        (id, t, tfv, dfv, tfv * 1000000L * (2 * n - 2 * dfv + 1) / (2 * dfv + 1))
      }.toSeq.sortBy { case (_, t, _, _, s) => (-s, t) }
        .take(TextOps.TfidfK).zipWithIndex
        .map { case ((i, t, tfv, dfv, s), r) => (i, r + 1L, t, tfv, dfv, s) }
    }.toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == want,
      s"tfidf mismatch; sample diff: ${(got -- want).take(2)} vs ${(want -- got).take(2)}")
    // the rnk<=k filter must plan a WindowGroupLimit under the
    // exchange — a mega-doc then ships k×partitions rows, not its
    // whole vocabulary (asserted on the UNSEALED plan; sealing
    // checkpoints and erases it)
    val (topkPlan, tfFrame) = TextOps.textTfidfUnsealed(spark, sfDir)
    val plan = topkPlan.queryExecution.executedPlan.toString
    graft.Scratch.free(tfFrame)
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("text_vocab: coverage curve matches a Scala recomputation and ends at 100% coverage") {
    import graft.operators.TextOps
    val rows = TextOps.textVocab(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= TextOps.VocabTopK)
    val toks = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    val total = toks.length.toLong
    val want = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(TextOps.VocabTopK)
    var cum = 0L
    want.zipWithIndex.zip(rows).foreach { case (((t, c), i), r) =>
      cum += c
      assert(r.getLong(0) == i + 1L && r.getString(1) == t &&
        r.getLong(2) == c && r.getLong(3) == 10000L * cum / total,
        s"rank ${i + 1}: got ${r.toSeq} want ($t, $c, ${10000L * cum / total})")
    }
    // the curve is monotone, and when the whole vocabulary fits in
    // top-K the final rank covers everything
    assert(rows.map(_.getLong(3)).toSeq == rows.map(_.getLong(3)).sorted.toSeq)
    if (want.length < TextOps.VocabTopK) assert(rows.last.getLong(3) == 10000L)
    // the top-K cut must be a TakeOrdered (per-partition heads +
    // merge), never a global sort of the vocabulary
    val plan = TextOps.textVocab(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Sort [cnt"), s"global vocabulary sort in:\n$plan")
  }

  test("embed_stats: per-label tightness matches an exact Scala recomputation") {
    import graft.operators.VectorOps
    val rows = VectorOps.embedStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val raw = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS emb")
      .collect()
      .map(r => (r.getInt(1), r.getSeq[Double](2).map(x => math.floor(x * 10000 + 0.5).toLong)))
    def dot(a: Seq[Long], b: Seq[Long]): Long = a.zip(b).map { case (x, y) => x * y }.sum
    val byLabel = raw.filter(v => dot(v._2, v._2) > 0).groupBy(_._1)
    val want = byLabel.flatMap { case (label, vs) =>
      val dim = vs.head._2.length
      val cq2 = (0 until dim).map { d =>
        val s = vs.map(_._2(d)).sum
        val m = math.floor(s.toDouble / vs.length).toLong
        // FLOOR(sum/count) on doubles == floorDiv for |sum| < 2^53
        assert(m == math.floorDiv(s, vs.length.toLong))
        m
      }
      val cn2 = dot(cq2, cq2)
      if (cn2 <= 0) None else {
        val scores = vs.map { case (_, q) =>
          math.floor(dot(q, cq2) / (math.sqrt(dot(q, q).toDouble) * math.sqrt(cn2.toDouble)) * 1000000 + 0.5).toLong
        }
        Some(label -> (vs.length.toLong, cn2,
          math.floor(scores.sum.toDouble / scores.length).toLong))
      }
    }
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (n, cn2, mean) = want(r.getInt(0))
      assert(r.getLong(1) == n && r.getLong(2) == cn2 && r.getLong(3) == mean,
        s"label ${r.getInt(0)}: got ${r.toSeq} want ($n, $cn2, $mean)")
    }
  }

  test("text_ttr matches a per-doc Scala recomputation and is bounded by 1") {
    val rows = TextOps.textTtr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ", -1)
      val types = toks.distinct.length.toLong
      assert(r.getAs[Long]("n_types") == types)
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
      assert(r.getAs[Long]("ttr_e4") == 10000 * types / toks.length)
      assert(r.getAs[Long]("ttr_e4") <= 10000)
    }
  }

  test("text_oov: scores are bounded and deterministic across re-runs") {
    val a = TextOps.textOov(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.forall(r => r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens")))
    assert(a.forall(r => (0L to 10000L).contains(r.getAs[Long]("oov_e4"))))
    val b = TextOps.textOov(spark, sfDir).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "vocab cut must be deterministic (count desc, token asc)")
  }

  test("pipe_split: partitions are exhaustive, disjoint and subset-stable") {
    import graft.operators.TrainOps
    val full = TrainOps.pipeSplit(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(full.nonEmpty)
    assert(full.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(full.size == Tables.documents(spark, sfDir).count())
    // the no-leakage property: computing the split over a SUBSET of the
    // corpus assigns every surviving doc the same way (assignment is a
    // pure function of the id, not of corpus composition)
    val half = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_split_").toString
    half.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val sub = TrainOps.pipeSplit(spark, dir2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(sub.nonEmpty)
    sub.foreach { case (id, s) => assert(full(id) == s,
      s"doc $id moved from ${full(id)} to $s when the corpus shrank") }
  }

  test("pipe_curriculum: bands exhaustive and growth-stable; positions dense per (band, shard)") {
    import graft.operators.TrainOps
    val full = TrainOps.pipeCurriculum(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("band"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))).toMap
    assert(full.nonEmpty && full.size == Tables.documents(spark, sfDir).count())
    assert(full.values.map(_._1).toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
    // positions are a dense 0..n-1 sequence within every (band, shard)
    full.values.groupBy(v => (v._1, v._2)).foreach { case (bs, vs) =>
      val ps = vs.map(_._3).toSeq.sorted
      assert(ps == (0L until ps.size.toLong), s"holes in positions of $bs")
    }
    // growth stability: band and shard are pure functions of the doc —
    // recomputing over a subset never re-bands or re-shards a doc
    // (fixed cuts, not quantiles; position may compact, order may not
    // flip: relative pos order within (band, shard) is preserved)
    val half = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_curr_").toString
    half.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val sub = TrainOps.pipeCurriculum(spark, dir2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("band"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))).toMap
    assert(sub.nonEmpty)
    sub.foreach { case (id, (b, sh, _)) =>
      assert(full(id)._1 == b && full(id)._2 == sh,
        s"doc $id re-banded/re-sharded when the corpus shrank") }
    sub.groupBy { case (_, (b, sh, _)) => (b, sh) }.foreach { case (_, docs) =>
      val byOld = docs.toSeq.sortBy { case (id, _) => full(id)._3 }.map(_._2._3)
      assert(byOld == byOld.sorted, "relative curriculum order flipped under subsetting")
    }
  }

  test("dedup_incremental: broadcast delta, corpus never self-joins, pairs == restricted full dedup") {
    import graft.operators.TextOps
    // the UNSEALED frame keeps the plan (sealing checkpoints it away)
    val (pairs, scratch) = TextOps.dedupIncrementalUnsealed(spark, sfDir)
    val got0 = pairs.collect()
    // ONE join and it is the broadcast hash join (delta side built,
    // corpus side streamed once) — a self-join of the banded frame
    // would show a second join or a sort-merge over two exchanges
    // (captured AFTER the action so AQE's final plan is asserted)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert("Join".r.findAllIn(plan.replace("BroadcastHashJoin", "BHJ")).isEmpty,
      s"unexpected extra join in:\n$plan")
    graft.Scratch.seal(pairs.limit(1), scratch).collect() // release scratch
    val got = got0.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // equivalence: the FULL self-join's pairs, restricted to
    // (delta, base) and re-oriented, are exactly the incremental pairs
    val full = TextOps.dedupMinhash(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("n_bands")))
    val want = full.collect {
      case (a, b, n) if (a % 10 == 7) != (b % 10 == 7) =>
        if (a % 10 == 7) (a, b, n) else (b, a, n)
    }.toSet
    assert(got == want, s"incremental=${got.size} restricted-full=${want.size}")
    assert(got.nonEmpty, "no cross-slice pairs at spec scale — vacuous")
  }

  test("pipe_decontaminate: only train-x-holdout pairs, each from the ngram detector") {
    import graft.operators.TrainOps
    val rows = TrainOps.pipeDecontaminate(spark, sfDir).collect()
    assert(rows.nonEmpty, "no contamination pairs at spec scale — vacuous")
    val split = TrainOps.pipeSplit(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val detector = TextOps.dedupNgram(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    rows.foreach { r =>
      val t = r.getAs[Long]("train_id")
      val e = r.getAs[Long]("eval_id")
      assert(split(t) == "train", s"train side $t is in split ${split(t)}")
      assert(split(e) != "train", s"eval side $e is in the train split")
      assert(detector.contains((t min e, t max e)),
        s"pair ($t,$e) not produced by the ngram detector")
    }
  }

  test("pipe_decontam_asym: broadcast-eval plan produces the symmetric detector's exact rows") {
    import graft.operators.TrainOps
    // the UNSEALED frame keeps the plan (sealing checkpoints it away)
    val (asym, scratch) = TrainOps.pipeDecontaminateAsymUnsealed(spark, sfDir)
    val rows = asym.collect()
    // plan shape: the eval side rides a broadcast — the train corpus
    // never self-joins (captured AFTER the action so AQE's final plan
    // is what's asserted)
    val plan = asym.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval side is not broadcast:\n$plan")
    graft.Scratch.seal(asym.limit(1), scratch).collect() // release the scratch frame
    val sym = TrainOps.pipeDecontaminate(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length == sym.length,
      s"asym=${rows.length} sym=${sym.length}")
    rows.zip(sym).foreach { case (a, s) =>
      assert(a.toSeq == s.toSeq, s"asym=${a.toSeq} sym=${s.toSeq}")
    }
  }

  test("graft_hash60 is bit-identical to the md5-hex/conv formulation") {
    graft.functions.GraftFunctions.register(spark)
    val mismatches = Tables.documents(spark, sfDir)
      .select(
        expr("graft_hash60(text)").as("native"),
        expr("CAST(conv(substring(md5(text),1,15),16,10) AS BIGINT)").as("hex"))
      .filter(col("native") =!= col("hex")).count()
    assert(mismatches == 0)
  }

  test("text_fingerprint: identical text => identical fingerprints") {
    val fp = TextOps.textFingerprint(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val joined = fp.join(docs, "doc_id")
    val groups = joined.groupBy("text")
      .agg(countDistinct("fp_content").as("nfp"), countDistinct("fp_shingle").as("nsh"))
    assert(groups.filter(col("nfp") > 1 || col("nsh") > 1).count() == 0)
  }

  test("dedup_minhash candidates have genuinely high Jaccard on planted dups") {
    val cands = TextOps.dedupMinhash(spark, sfDir)
    assert(cands.count() > 0, "no candidate pairs found — LSH bands broken?")
    // pairs found by >= 3 of 4 bands should also pass the 3-gram gate
    val strong = cands.filter(col("n_bands") >= 3)
    val ngram = TextOps.dedupNgram(spark, sfDir)
    val missed = strong.join(ngram, Seq("a_id", "b_id"), "left_anti").count()
    assert(missed <= strong.count() / 2,
      s"$missed of ${strong.count()} strong minhash pairs fail the ngram gate")
  }

  test("dedup_ngram_prod cascade: exactly full-detector ∩ candidates, scores identical") {
    // the production arm must equal the full detector restricted to
    // the minhash candidate graph — same pairs, same jac_e4 (the
    // array_intersect verify re-derives the self-join's match count)
    val full = TextOps.dedupNgram(spark, sfDir)
    val prod = TextOps.dedupNgramProd(spark, sfDir)
    assert(prod.count() > 0, "cascade found nothing — prefilter or verify broken?")
    val cand = TextOps.dedupMinhash(spark, sfDir).select("a_id", "b_id")
    val expected = full.join(cand, Seq("a_id", "b_id"), "left_semi")
    val missing = expected.join(prod, Seq("a_id", "b_id", "jac_e4"), "left_anti").count()
    val extra = prod.join(expected, Seq("a_id", "b_id", "jac_e4"), "left_anti").count()
    assert(missing == 0 && extra == 0,
      s"cascade diverges from full∩cand: $missing missing, $extra extra/mis-scored")
  }

  test("cross-detector agreement: high-precision ngram pairs are found by the sketch detectors") {
    // Guards against STRUCTURAL flaws an implementation-mirroring
    // oracle cannot catch (the simhash half-band recall bug passed the
    // oracle gate because the oracle shared the banding): independent
    // detectors must substantially agree on the planted near-dups.
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ngram = pairSet(TextOps.dedupNgram(spark, sfDir))
    assert(ngram.nonEmpty)
    val simhash = pairSet(TextOps.dedupSimhash(spark, sfDir))
    val minhash = pairSet(TextOps.dedupMinhash(spark, sfDir))
    val shRecall = (ngram & simhash).size.toDouble / ngram.size
    val mhRecall = (ngram & minhash).size.toDouble / ngram.size
    assert(shRecall >= 0.7, s"simhash finds only ${(shRecall * 100).round}% of ngram pairs")
    assert(mhRecall >= 0.9, s"minhash finds only ${(mhRecall * 100).round}% of ngram pairs")
  }

  test("dedup_simhash production geometry (60,4): subset of gate pairs, exact dups kept") {
    // prefix pin (FunctionsPropertySpec) ⇒ hamming on the 60-bit sig
    // >= hamming on its low-32 gate prefix, so the d<=3 production
    // pair set must be a SUBSET of the gate's — the wider signature
    // only sheds, never invents. And identical texts hash to identical
    // sigs at any width, so exact-duplicate pairs survive every
    // geometry (the recall floor the pigeonhole argument guarantees).
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gate = pairSet(TextOps.dedupSimhash(spark, sfDir))
    val prod = TextOps.dedupSimhashWith(spark, sfDir, 60, 4)
    assert(prod.filter(col("hamming") > 3 || col("a_id") >= col("b_id")).count() == 0)
    val prodSet = pairSet(prod)
    assert(prodSet.subsetOf(gate),
      s"${(prodSet -- gate).size} production pairs missing from the gate set")
    // exact-dup floor on PLANTED duplicates (the corpus's near-dups
    // are perturbed, never verbatim): doc k duplicated as doc k+10^6
    // must pair at hamming 0 under every geometry
    // orderBy before limit: an unordered limit is evaluated per ACTION,
    // and the planted union and the `wanted` collect are two actions —
    // Spark may pick different 40 rows for each, flaking the assert
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(40)
    val planted = docs.union(docs.withColumn("doc_id", col("doc_id") + 1000000L))
    val wanted = docs.select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    for ((bits, bands, d) <- Seq((60, 4, 3), (60, 6, 5))) {
      val plantedPairs = pairSet(
        TextOps.dedupSimhashOf(planted, bits, bands, d).filter(col("hamming") === 0))
      assert(wanted.subsetOf(plantedPairs),
        s"${(wanted -- plantedPairs).size} planted exact-dup pairs lost at ($bits,$bands,d<=$d)")
    }
  }

  test("dedup_simhash sharded (block-combination keys) is pair-identical to the banded arm") {
    // both detectors return EXACTLY the pairs at Hamming distance <= d
    // (banded: pigeonhole over bands; sharded: pigeonhole over block
    // subsets) — so at equal (bits, d) the outputs must match row-for-
    // row, hamming column included. This is the spec the r12 verdict
    // asked for ("sharded variant (pair-identical spec)").
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val banded = rows(TextOps.dedupSimhashWith(spark, sfDir, 60, 6, 5))
    val sharded = rows(TextOps.dedupSimhashSharded(spark, sfDir))
    assert(sharded == banded,
      s"sharded/banded divergence: ${sharded.size} vs ${banded.size} pairs")
    // a second geometry point: t = blocks - d exactly (the tightest
    // legal key width at these blocks)
    val sharded5 = rows(TextOps.dedupSimhashShardedOf(
      Tables.documents(spark, sfDir), 60, 10, 5, 5))
    assert(sharded5 == banded)
    // the guarantee-voiding geometry must be refused loudly
    intercept[IllegalArgumentException] {
      TextOps.dedupSimhashShardedOf(Tables.documents(spark, sfDir), 60, 10, 6, 5)
    }
    // SCALE guard (r14): the key self-join must plan shuffle-family,
    // never a broadcast of `keyed` — the posexplode's 210×
    // row-multiplier is invisible to Generate's size estimate (the
    // checkpointed LogicalRDD inherits the underestimate), and on a
    // diverse corpus (the regime this arm exists for) the resulting
    // BroadcastHashJoin died building a multi-GB broadcast at n=300k
    val plan = TextOps.dedupSimhashSharded(spark, sfDir)
      .queryExecution.executedPlan.toString
    val joins = "BroadcastHashJoin".r.findAllIn(plan).length
    // the intra/inter expansion joins MAY broadcast (their build
    // sides are output-sized); the key join itself is identifiable by
    // the first-shared-key canonical predicate
    assert(!plan.split("\n").exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("graft_first_simhash_key")),
      s"the sharded key join planned as a broadcast ($joins BHJs):\n$plan")
    Scratch.releaseAll()
  }

  test("dedup_components: labels are transitively closed over candidate pairs") {
    import graft.operators.Components
    val comp = Components.dedupComponents(spark, sfDir)
      .select("doc_id", "component")
    val pairs = TextOps.minhashCandidates(spark, sfDir)
    // every edge must connect nodes with the SAME component label
    val viol = pairs
      .join(comp.withColumnRenamed("doc_id", "a_id").withColumnRenamed("component", "ca"), "a_id")
      .join(comp.withColumnRenamed("doc_id", "b_id").withColumnRenamed("component", "cb"), "b_id")
      .filter(col("ca") =!= col("cb")).count()
    assert(viol == 0, s"$viol edges cross components — closure incomplete")
    // exactly one keeper per component
    val keepers = Components.dedupComponents(spark, sfDir)
      .filter(col("keep")).groupBy("component").count()
    assert(keepers.filter(col("count") =!= 1).count() == 0)
  }

  test("dedup_exact keeps one id per distinct text") {
    val d = TextOps.dedupExact(spark, sfDir)
    assert(d.count() == Tables.documents(spark, sfDir).select("text").distinct().count())
  }

  test("dedup_substring flags a verbatim 8-token run against an earlier doc; owner and novel docs stay clean") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val run = "alpha bravo charlie delta echo foxtrot golf hotel" // exactly W = 8 tokens
    val docs = Seq(
      // 0: the passage's first owner — must NOT be flagged by its own window
      (0L, s"opening words here $run and a unique tail zero"),
      // 1: copies the passage verbatim inside otherwise-novel text
      (1L, s"completely different framing $run with another ending one"),
      // 2: shares 7 of the 8 tokens (one swapped) — BELOW the window width, clean
      (2L, "alpha bravo charlie delta echo foxtrot golf india plus filler words two"),
      // 3: wholly novel
      (3L, "nothing in common with any other document at all in this corpus three")
    ).toDF("doc_id", "text")
    val got = TextOps.dedupSubstringOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(0L)._2 == 0L, s"first owner flagged: ${got(0L)}")
    assert(got(1L) == (1L, 1L), s"verbatim copier not flagged once: ${got(1L)}")
    assert(got(2L)._2 == 0L, s"7-token overlap (< W) flagged: ${got(2L)}")
    assert(got(3L)._2 == 0L, s"novel doc flagged: ${got(3L)}")
    // every document yields windows (short docs fall back to one partial window)
    assert(TextOps.dedupSubstringOf(docs).count() == 4)
  }

  test("dedup_substring_inc: delta flags against corpus windows; corpus never shuffles raw rows") {
    graft.functions.GraftFunctions.register(spark)
    val df = TextOps.dedupSubstringInc(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty, "no delta docs at this corpus — vacuous")
    // only delta docs appear, every column internally consistent
    rows.foreach { r =>
      assert(r.getLong(0) % 10 == 7)
      assert(r.getLong(2) <= r.getLong(1), "more dup windows than windows")
      assert((r.getLong(3) == 1L) == (r.getLong(2) > 0L))
    }
    // semantics cross-check vs the full detector's window table: a
    // delta doc is dup iff it shares ANY window hash with a corpus doc
    import org.apache.spark.sql.functions._
    val w = TextOps.SubstringW
    val wins = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(0, greatest(size(toks) - $w, 0)), " +
          s"i -> concat_ws(' ', slice(toks, i + 1, $w))))")).as("s"))
      .select(col("doc_id"), expr("graft_hash60(s)").as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val corpusH = wins.collect { case (d, h) if d % 10 != 7 => h }.toSet
    val expect = wins.filter(_._1 % 10 == 7).groupBy(_._1).map { case (d, ws) =>
      d -> ws.count(w => corpusH.contains(w._2)).toLong
    }
    rows.foreach { r =>
      assert(expect(r.getLong(0)) == r.getLong(2),
        s"doc ${r.getLong(0)}: expected ${expect(r.getLong(0))} dup windows, got ${r.getLong(2)}")
    }
    // plan: the corpus window stream feeds BROADCAST hash joins — the
    // append-only shape must never shuffle raw corpus rows on the
    // window hash (only matched-hash partials cross an exchange)
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected two broadcast probes (delta set, hit set):\n$plan")
  }

  test("window-index append ≡ recompute, and the appended index answers day-2 probes") {
    import graft.operators.TextOps
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val delta = docs.filter(col("doc_id") % 10 === 7)
    // merge ≡ recompute: appending the accepted delta's windows into
    // yesterday's index is row-for-row the index rebuilt from scratch
    val appended = TextOps.appendWindowIndex(TextOps.windowIndexOf(corpus), delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recomputed = TextOps.windowIndexOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(appended == recomputed,
      s"append diverged from recompute: ${appended.size} vs ${recomputed.size}")
    assert(appended.nonEmpty, "empty index at spec scale — vacuous")
    // the loop actually closes: day N+1's verbatim copy of a day-N
    // DELTA doc probes the APPENDED index as a full dup (it would miss
    // against the stale day-N index)
    val idx = TextOps.appendWindowIndex(TextOps.windowIndexOf(corpus), delta)
    val day2 = delta.limit(1)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val probe = TextOps.substringWindows(day2)
      .join(idx, Seq("h"), "left_outer")
    assert(probe.filter(col("hit").isNull).count() == 0,
      "a verbatim day-N delta copy still has unseen windows after the append")
  }

  test("delta-broadcast guard: oversized delta drops the hints, fallback row-identical") {
    import graft.operators.TextOps
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, SHUFFLE_MERGE}
    graft.functions.GraftFunctions.register(spark)
    def hintsWith(df: org.apache.spark.sql.DataFrame,
        strategy: org.apache.spark.sql.catalyst.plans.logical.JoinStrategyHint): Seq[Any] =
      df.queryExecution.optimizedPlan.collect {
        case j: LJoin if Seq(j.hint.leftHint, j.hint.rightHint).flatten
          .exists(_.strategy.contains(strategy)) => j.hint
      }
    // substring detector: default ceiling keeps the forced broadcasts…
    val small = TextOps.dedupSubstringInc(spark, sfDir)
    assert(hintsWith(small, BROADCAST).nonEmpty,
      "small-delta plan lost its broadcast hints — the fast path regressed")
    // …a ceiling of 0 (every delta oversized) must swap EVERY forced
    // broadcast for a MERGE pin (hint-free would leave the static
    // planner free to re-broadcast from the Generate-descended
    // underestimate — the r14 sharded-simhash trap) and answer
    // identically
    val guarded = TextOps.dedupSubstringIncWith(spark, sfDir, 0L)
    assert(hintsWith(guarded, BROADCAST).isEmpty,
      "guard did not fire: a delta-scaled frame is still forced-broadcast")
    assert(hintsWith(guarded, SHUFFLE_MERGE).nonEmpty,
      "over-ceiling fallback lost its merge pin — the static broadcast window re-opened")
    assert(guarded.collect().toSeq == small.collect().toSeq,
      "merge-pinned fallback diverged from the broadcast plan")
    // minhash incremental detector: same contract (its fallback stays
    // hint-free: the banded-signature explode multiplies rows by the
    // CONSTANT band count, so the Generate underestimate is a bounded
    // small factor — not the corpus-scaled window-explode the passage
    // detectors pin with merge)
    val (pSmall, s1) = TextOps.dedupIncrementalUnsealed(spark, sfDir)
    assert(hintsWith(pSmall, BROADCAST).nonEmpty)
    val (pGuard, s2) = TextOps.dedupIncrementalUnsealed(spark, sfDir, maxBroadcastDocs = 0L)
    assert(hintsWith(pGuard, BROADCAST).isEmpty,
      "guard did not fire on the banded-signature broadcast")
    val a = pSmall.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = pGuard.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.Scratch.seal(pSmall.limit(1), s1).collect()
    graft.Scratch.seal(pGuard.limit(1), s2).collect()
    assert(a == b, s"fallback pairs diverged: broadcast=${a.size} fallback=${b.size}")
    assert(a.nonEmpty, "no cross-slice pairs at spec scale — vacuous")
  }

  test("passage detectors: the fingerprint→owner join is merge-pinned, row-identical to the unpinned plan") {
    // r14 verdict item 5: firstSeen's size estimate descends from the
    // window explode (whose multiplier Catalyst ignores), so at
    // intermediate corpus sizes a static BroadcastHashJoin could ride
    // an estimate many× too low. The merge pin must (a) keep results
    // byte-identical to the unpinned formulation and (b) leave no
    // broadcast join anywhere in the executed plan.
    import graft.operators.TextOps
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    def ownerAgg(rows: org.apache.spark.sql.DataFrame, key: String,
        nCol: String, dupCol: String): org.apache.spark.sql.DataFrame = {
      val firstSeen = rows.groupBy(key).agg(min("doc_id").as("first_doc"))
      rows.join(firstSeen, key) // UNPINNED — the pre-r15 shape
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as(nCol),
          sum(when(col("doc_id") > col("first_doc"), 1L).otherwise(0L)).as(dupCol),
          max(when(col("doc_id") > col("first_doc"), 1L).otherwise(0L)).as("is_dup"))
        .select(col("doc_id"), col(nCol), col(dupCol), col("is_dup"))
        .orderBy("doc_id")
    }
    for ((name, pinned, unpinned) <- Seq(
      ("dedup_substring", TextOps.dedupSubstring(spark, sfDir),
        ownerAgg(TextOps.substringWindows(docs), "h", "n_windows", "n_dup_windows")),
      ("dedup_winnow", TextOps.dedupWinnow(spark, sfDir),
        ownerAgg(TextOps.winnowFps(docs), "fp", "n_fps", "n_dup_fps")))) {
      val got = pinned.collect().toSeq
      assert(got.nonEmpty && got == unpinned.collect().toSeq,
        s"$name: merge pin changed the answer")
      val plan = pinned.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"$name: the owner join still rides a broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin"),
        s"$name: expected the merge-pinned join:\n$plan")
    }
  }

  test("dedup_substring plan: bounded hash shuffles (fan-out + agg + join + rollup), no join ever enumerates doc pairs") {
    graft.functions.GraftFunctions.register(spark)
    val df = TextOps.dedupSubstring(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    // the linear-work claim: the input fan-out (Tables.spread — §2.5
    // input skew, a small exchange of (doc_id, text) that the STATIC
    // plan counts once per join branch; AQE stage reuse dedupes the
    // identical scan side at runtime) + window-hash aggregate + the
    // occurrence side of the join + the per-doc count — and nothing
    // else (a pair-enumerating formulation would add a shuffle per
    // join side of the DOC-PAIR frame, which scales with pairs, not
    // with the corpus)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 5, s"expected <= 5 hash exchanges, got $shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"pair enumeration crept into the plan:\n$plan")
  }

  test("embed_quantize: codes span [0,255] and reconstruction stays within one quantization step") {
    val codes = VectorOps.embedQuantize(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("pos")) -> r.getAs[Long]("code"))
      .toMap
    assert(codes.nonEmpty && codes.values.forall(c => c >= 0L && c <= 255L))
    // per-dim lo/hi and the raw e4 values, recomputed independently
    val raw = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), posexplode(
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"))
        .as(Seq("pos", "x")))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("pos").toLong, r.getAs[Long]("x")))
    val range = raw.groupBy(_._2).map { case (p, xs) =>
      p -> (xs.map(_._3).min, xs.map(_._3).max) }
    // extremes must hit the code endpoints (the affine map is onto)
    assert(raw.exists { case (v, p, x) => x == range(p)._1 && codes((v, p)) == 0L })
    assert(raw.exists { case (v, p, x) => x == range(p)._2 && codes((v, p)) == 255L })
    raw.foreach { case (v, p, x) =>
      val (lo, hi) = range(p)
      val step = math.max(hi - lo, 1L) / 255.0
      val decoded = lo + codes((v, p)) * step
      assert(math.abs(decoded - x) <= step + 1,
        s"vec $v dim $p: decoded $decoded vs raw $x exceeds one step ($step)")
    }
  }

  test("ann_bruteforce: 5 neighbors per vector, self excluded, ranks contiguous") {
    val ann = VectorOps.annBruteforce(spark, sfDir)
    val n = Tables.embeddings(spark, sfDir).count()
    assert(ann.count() == 5 * n)
    assert(ann.filter(col("q_id") === col("n_id")).count() == 0)
    val ranks = ann.groupBy("q_id").agg(collect_set("rnk").as("r"))
    assert(ranks.filter(size(col("r")) =!= 5).count() == 0)
  }

  test("pipe_sample is deterministic and stratum-rate-shaped; pipe_pack bins respect the cumsum rule") {
    import graft.operators.TrainOps
    val s1 = TrainOps.pipeSample(spark, sfDir).collect()
    val s2 = TrainOps.pipeSample(spark, sfDir).collect()
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq, "sampling must be reproducible")
    // every kept row is under its stratum's rate threshold
    s1.foreach { r =>
      val cap = if (r.getAs[String]("stratum") == "good") 8000L else 1000L
      assert(r.getAs[Long]("h_e4") < cap)
    }
    val p = TrainOps.pipePack(spark, sfDir).collect()
    assert(p.length == Tables.documents(spark, sfDir).count())
    // within a shard, docs in doc-id order have non-decreasing bins and
    // tok_before consistent with the running cumsum
    p.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("tok_before") == cum)
        assert(r.getAs[Long]("bin") == cum / TrainOps.PackBudget)
        cum += r.getAs[Long]("tok")
      }
    }
  }

  test("ann_bruteforce refuses an over-ceiling query side") {
    val v = Tables.embeddings(spark, sfDir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(1 AS BIGINT))").as("q"), lit(64L).as("n2"))
    val e = intercept[IllegalArgumentException](
      VectorOps.annBruteforceFor(v, v, 5, maxQueries = 3))
    assert(e.getMessage.contains("annLsh"))
  }

  test("ann_lsh results are a subset-quality approximation of brute force") {
    val bf = VectorOps.annBruteforce(spark, sfDir)
      .filter(col("rnk") === 1).select(col("q_id"), col("score_e6").as("bf_score"))
    val lsh = VectorOps.annLsh(spark, sfDir)
      .filter(col("rnk") === 1).select(col("q_id"), col("score_e6").as("lsh_score"))
    // LSH top-1 can never beat exact top-1
    val bad = bf.join(lsh, "q_id").filter(col("lsh_score") > col("bf_score")).count()
    assert(bad == 0)
  }

  test("minhash 1-row bands are a candidate SUPERSET of the default 2-row bands") {
    // if a pair agrees on band (mh_{2j}, mh_{2j+1}) it agrees on rows
    // 2j and 2j+1 individually — so loosening bandRows can only add
    // candidates, never lose one
    def pairs(rows: Int) = TextOps.minhashCandidatesWith(spark, sfDir, rows)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loose = pairs(1)
    val default = pairs(2)
    assert(default.subsetOf(loose),
      s"default-band pairs missing from 1-row bands: ${(default -- loose).take(3)}")
    assert(loose.size >= default.size)
  }

  test("minhash k=16 signatures are a candidate SUPERSET of k=8 (shared coefficient prefix)") {
    // the first 8 affine maps are shared across every k, so a k=16
    // 2-row-banded run contains all of k=8's bands plus 4 more —
    // candidates can only be added; this also pins the md5-derived
    // coefficient extension (a changed derivation would break the
    // prefix property)
    def pairs(k: Int) = TextOps.minhashCandidatesFullWith(spark, sfDir, k, bandRows = 2)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val k8 = pairs(8)
    val k16 = pairs(16)
    assert(k8.subsetOf(k16), s"k=8 pairs missing from k=16: ${(k8 -- k16).take(3)}")
  }

  test("ann_lsh alternate band geometry (2x8-bit) still bounded by the exact baseline") {
    val bf = VectorOps.annBruteforce(spark, sfDir)
      .filter(col("rnk") === 1).select(col("q_id"), col("score_e6").as("bf_score"))
    val lsh = VectorOps.annLshWith(spark, sfDir, bands = 2, bitsPerBand = 8)
      .filter(col("rnk") === 1).select(col("q_id"), col("score_e6").as("lsh_score"))
    assert(lsh.count() > 0)
    val bad = bf.join(lsh, "q_id").filter(col("lsh_score") > col("bf_score")).count()
    assert(bad == 0)
  }

  test("ann_ivf alternate geometry (32 cells, 4 probes) still bounded by the exact baseline") {
    val bf = VectorOps.annBruteforce(spark, sfDir)
      .filter(col("rnk") === 1).select(col("q_id"), col("score_e6").as("bf_score"))
    val ivf = VectorOps.annIvfWith(spark, sfDir, cells = 32, probes = 4)
      .filter(col("rnk") === 1).select(col("q_id"), col("score_e6").as("ivf_score"))
    assert(ivf.count() > 0)
    val bad = bf.join(ivf, "q_id").filter(col("ivf_score") > col("bf_score")).count()
    assert(bad == 0)
  }

  test("pipe_mix: deterministic mixture with whole+fractional upsampling per source weight") {
    import graft.operators.TrainOps
    val a = TrainOps.pipeMix(spark, sfDir).collect()
    val b = TrainOps.pipeMix(spark, sfDir).collect()
    assert(a.nonEmpty && a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // per doc: copies are 0..n-1 for n = weight DIV 1e4 (+1 fractional)
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val w = rows.head.getLong(2)
      val copies = rows.map(_.getLong(3)).sorted.toSeq
      assert(copies == (0L until copies.length.toLong).toSeq)
      val lo = w / 10000; val hi = lo + 1
      assert(copies.length == lo || copies.length == hi,
        s"copy count ${copies.length} outside [$lo,$hi] for weight $w")
    }
    // a doc may be dropped ONLY when its source's weight is sub-1x
    val srcByDoc = Tables.documents(spark, sfDir).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val mixed = a.map(_.getLong(0)).toSet
    val weightsBySource = a.map(r => r.getString(1) -> r.getLong(2)).toMap
    (srcByDoc.keySet -- mixed).foreach { d =>
      weightsBySource.get(srcByDoc(d)).foreach(w =>
        assert(w < 10000, s"doc $d dropped though source weight $w >= 1x"))
    }
    assert(weightsBySource.values.forall(w => w >= 3000 && w < 25000))
  }

  test("pipe_shuffle: epoch order is reproducible and per-shard positions are contiguous") {
    import graft.operators.TrainOps
    val a = TrainOps.pipeShuffle(spark, sfDir).collect()
    val b = TrainOps.pipeShuffle(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val n = Tables.documents(spark, sfDir).count()
    assert(a.length == n)
    // positions within a shard are a permutation 0..count-1
    a.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      val pos = rows.map(_.getLong(2)).sorted.toSeq
      assert(pos == (0L until rows.length.toLong).toSeq, s"shard $shard positions not contiguous")
    }
    // and the order is NOT the identity (it actually shuffles)
    val inOrder = a.sortBy(_.getLong(0)).map(_.getLong(2)).toSeq
    assert(inOrder != inOrder.sorted)
  }

  test("ann_ivf Lloyd refinement lifts recall over raw seed centroids on a clustered corpus") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // 4 well-separated clusters in 16 dims; the 4 SEED vectors
    // (vec_id < cells) all sit in cluster 0 — the worst case the
    // first-C-rows seeding can hit. One Lloyd step must pull the
    // cell centroids toward the actual clusters.
    val dim = 16
    val clusters = 4
    val n = 160
    def emb(id: Long): Array[Double] = {
      val c = if (id < clusters) 0 else (id % clusters).toInt
      Array.tabulate(dim) { d =>
        val base = if (d / (dim / clusters) == c) 1.0 else 0.0
        val noise = (((id * 1103515245L + d * 12345L) % 1000L) - 500L) / 500.0 * 0.3
        base + noise
      }
    }
    def quantFrame() = {
      val df = (0L until n.toLong).map(i => (i, emb(i))).toDF("vec_id", "embedding")
      df.withColumn("q", expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"))
        .withColumn("n2", expr("long_dot(q, q)"))
        .filter(col("n2") > 0)
        .select("vec_id", "q", "n2")
    }
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSets(VectorOps.annBruteforceFor(quantFrame(), quantFrame(), 3))
    def recall(approx: Map[Long, Set[Long]]): Double =
      exact.map { case (q, ex) =>
        approx.get(q).map(_.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
      }.sum / exact.size
    val seedRecall = recall(topSets(VectorOps.annIvfOf(quantFrame(), clusters, 1, 3, lloydIters = 0)))
    val lloydRecall = recall(topSets(VectorOps.annIvfOf(quantFrame(), clusters, 1, 3, lloydIters = 1)))
    assert(lloydRecall > seedRecall,
      s"one Lloyd step should lift recall: seeds=$seedRecall lloyd=$lloydRecall")
    assert(lloydRecall >= 0.95, s"refined cells should be near-exact here: $lloydRecall")
    // multi-iteration composes the same step: on this well-separated
    // corpus the assignment is already stable after one step, so more
    // iterations must not DEGRADE it (monotone-safety of the loop)
    val lloyd3Recall = recall(topSets(VectorOps.annIvfOf(quantFrame(), clusters, 1, 3, lloydIters = 3)))
    assert(lloyd3Recall >= lloydRecall,
      s"extra Lloyd iterations degraded recall: 1-iter=$lloydRecall 3-iter=$lloyd3Recall")
  }

  test("ann_lsh recall@3 vs brute force clears a numeric floor on a clustered corpus") {
    // the same regression guard ann_ivf carries (Lloyd spec): a
    // numeric recall floor against the exact baseline, so a silent
    // bucketing/plane-derivation change cannot degrade LSH quality
    // without a spec failing. 64-dim corpus (the production plane
    // width), 4 well-separated clusters + noise.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dim = 64
    val clusters = 4
    val n = 160
    def emb(id: Long): Array[Double] = {
      val c = (id % clusters).toInt
      Array.tabulate(dim) { d =>
        val base = if (d / (dim / clusters) == c) 1.0 else 0.0
        val noise = (((id * 1103515245L + d * 12345L) % 1000L) - 500L) / 500.0 * 0.3
        base + noise
      }
    }
    def quantFrame() = {
      val df = (0L until n.toLong).map(i => (i, emb(i))).toDF("vec_id", "embedding")
      df.withColumn("q", expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"))
        .withColumn("n2", expr("long_dot(q, q)"))
        .filter(col("n2") > 0)
        .select("vec_id", "q", "n2")
    }
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSets(VectorOps.annBruteforceFor(quantFrame(), quantFrame(), 3))
    val lsh = topSets(VectorOps.annLshOf(quantFrame()))
    val recall = exact.map { case (q, ex) =>
      lsh.get(q).map(_.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }.sum / exact.size
    assert(recall >= 0.90, s"ann_lsh recall@3 fell below the floor: $recall")
  }

  test("ann_lsh first-shared-band candidates equal the distinct-based reference (pair-unique by construction)") {
    // the canonical-band predicate replaced a distinct over the whole
    // candidate set; this pins the equivalence row-for-row against an
    // inline distinct-based reference built from the SAME bucketed
    // frame, and pins that the new pair stream really is
    // duplicate-free before any dedup could hide a double-emit
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dim = 64
    def emb(id: Long): Array[Double] =
      Array.tabulate(dim)(d => (((id * 69621L + d * 823L) % 1000L) - 500L) / 500.0)
    def quantFrame() = (0L until 200L).map(i => (i, emb(i))).toDF("vec_id", "embedding")
      .withColumn("q", expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"))
      .withColumn("n2", expr("long_dot(q, q)"))
      .filter(col("n2") > 0)
      .select("vec_id", "q", "n2")
    val b = VectorOps.bucketedOf(quantFrame(), 4, 4, keepBandVector = true)
    // reference: the old shape — all colliding band rows, then distinct
    val ref = b.as("a").join(b.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = VectorOps.annLshCandidatesForSpec(b, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.toSet == ref, "canonical-band candidate set diverged from the distinct reference")
    assert(got.size == got.toSet.size,
      "a pair materialized from more than one band — firstSharedBand broke")
    assert(ref.nonEmpty)
    graft.Scratch.free(b)
  }

  test("ann_pq recall@3 vs brute force clears a numeric floor; index shuffles codes, not vectors") {
    // same harness as the LSH/IVF recall guards: 64-dim, 4 clusters +
    // noise. Two contracts pinned at once: (a) IVF-PQ quality — a
    // silent codebook-training/encoding change cannot degrade recall
    // without failing here; (b) the SIZE contract — the corpus side of
    // the candidate join carries (n_id, cell, codes[M], rn2) ONLY: no
    // quantized vector, no ADC table. Codes stay in [0, K).
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dim = 64
    val clusters = 4
    val n = 160
    def emb(id: Long): Array[Double] = {
      val c = (id % clusters).toInt
      Array.tabulate(dim) { d =>
        val base = if (d / (dim / clusters) == c) 1.0 else 0.0
        val noise = (((id * 1103515245L + d * 12345L) % 1000L) - 500L) / 500.0 * 0.3
        base + noise
      }
    }
    def quantFrame() = {
      val df = (0L until n.toLong).map(i => (i, emb(i))).toDF("vec_id", "embedding")
      df.withColumn("q", expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"))
        .withColumn("n2", expr("long_dot(q, q)"))
        .filter(col("n2") > 0)
        .select("vec_id", "q", "n2")
    }
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSets(VectorOps.annBruteforceFor(quantFrame(), quantFrame(), 3))
    val parts = VectorOps.annPqPlan(
      graft.Scratch.cp(quantFrame()), clusters, 1, 3,
      lloydIters = 1, pqIters = 3, nSub = VectorOps.PqSub, nCodes = VectorOps.PqCodes)
    try {
      val index = parts.index
      assert(index.columns.toSeq == Seq("n_id", "cell", "codes", "rn2"),
        s"PQ index must shuffle codes only, got ${index.columns.mkString(",")}")
      val codeRows = index.select("codes").collect()
      assert(codeRows.nonEmpty)
      codeRows.foreach { r =>
        val cs = r.getSeq[Long](0)
        assert(cs.length == VectorOps.PqSub)
        assert(cs.forall(c => c >= 0 && c < VectorOps.PqCodes), s"code out of range: $cs")
      }
      // candidate-pair uniqueness BY CONSTRUCTION (each n_id in exactly
      // one cell): the plan dropped its distinct on this argument
      assert(index.groupBy("n_id").count().filter(col("count") > 1).count() == 0,
        "a corpus vector appears in more than one cell — the no-distinct argument broke")
      val pq = topSets(parts.topk)
      val recall = exact.map { case (q, ex) =>
        pq.get(q).map(_.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
      }.sum / exact.size
      assert(recall >= 0.95, s"ann_pq recall@3 fell below the floor: $recall")
    } finally {
      graft.Scratch.free(parts.assigned)
      parts.dropIndex()
    }
  }

  test("ann_pq: the candidate probe joins exchange-free on the bucketed codes index") {
    // BucketedJoinSpec pattern: the index is written bucketed+sorted
    // on `cell`, so the probe's sort-merge join must plan with NO
    // exchange (and no sort) on the corpus side — the index's shuffle
    // was paid once at write time. Broadcast would hide the property.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dim = 64
    def emb(id: Long): Array[Double] =
      Array.tabulate(dim)(d => (((id * 48271L + d * 7919L) % 1000L) - 500L) / 500.0)
    def quantFrame() = (0L until 80L).map(i => (i, emb(i))).toDF("vec_id", "embedding")
      .withColumn("q", expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"))
      .withColumn("n2", expr("long_dot(q, q)"))
      .filter(col("n2") > 0)
      .select("vec_id", "q", "n2")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // the threshold must hold through EXECUTION, not just plan build —
    // AQE re-decides the join strategy per query stage at runtime
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val parts = VectorOps.annPqPlan(graft.Scratch.cp(quantFrame()), 4, 1, 3,
      lloydIters = 1, pqIters = 1, nSub = VectorOps.PqSub, nCodes = VectorOps.PqCodes)
    try {
      parts.topk.collect()
      val plan = parts.topk.queryExecution.executedPlan.toString.split("Initial Plan")(0)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join for the probe:\n$plan")
      // exactly ONE exchange on the join key: the ADC/query side. A
      // second hashpartitioning(cell...) would mean the index side
      // re-shuffled what its bucket layout already paid for.
      val cellExchanges = "Exchange hashpartitioning\\(cell".r
        .findAllIn(plan).length
      assert(cellExchanges == 1,
        s"expected exactly one cell exchange (the query side), got $cellExchanges:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"the index side should scan the bucketed layout:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      graft.Scratch.free(parts.assigned)
      parts.dropIndex()
    }
  }

  test("ann_bruteforce gate shape: bounded probes x corpus == full self-join restricted to the probes") {
    // the gate runs the enforced bounded contract shape (a fixed probe
    // set against the streaming corpus side); this pins that it loses
    // NOTHING vs the full quadratic self-join on the probe region —
    // the full join stays spec-run here, never gate/bench-run
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dim = 16
    def emb(id: Long): Array[Double] =
      Array.tabulate(dim)(d => (((id * 48271L + d * 7919L) % 1000L) - 500L) / 500.0)
    val df = (0L until 120L).map(i => (i, emb(i))).toDF("vec_id", "embedding")
      .withColumn("q", expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"))
      .withColumn("n2", expr("long_dot(q, q)"))
      .filter(col("n2") > 0)
      .select("vec_id", "q", "n2")
    def rows(d: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      d.select("q_id", "rnk", "n_id", "score_e6").collect()
        .map(_.toSeq).sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long])).toSeq
    val full = rows(VectorOps.annBruteforceFor(df, df, 5).filter(col("q_id") < 40))
    val bounded = rows(VectorOps.annBruteforceFor(df.filter(col("vec_id") < 40), df, 5))
    assert(bounded.nonEmpty && bounded == full,
      "bounded probe shape diverged from the full self-join on the probe region")
  }

  test("ann_ivf recall@3 on the real embeddings corpus clears a numeric floor vs brute force") {
    // the Lloyd spec pins recall on a SYNTHETIC clustered corpus; this
    // is the floor on the actual embeddings table with the default
    // gate geometry (16 cells, 2 probes, 1 Lloyd step), so a geometry
    // or centroid-derivation regression shows up against real data.
    // The pipeline is deterministic: measured recall is 0.373 on this
    // corpus (near-uniform embeddings are the hard case for IVF), vs
    // ~0.125 expected for random bucketing at 2/16 probes — the 0.30
    // floor certifies the clustering lift without flaking on a corpus
    // regeneration
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSets(VectorOps.annBruteforce(spark, sfDir).filter(col("rnk") <= 3))
    val ivf = topSets(VectorOps.annIvf(spark, sfDir))
    val recall = exact.map { case (q, ex) =>
      ivf.get(q).map(_.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }.sum / exact.size
    assert(recall >= 0.30, s"ann_ivf recall@3 on the real corpus fell below the floor: $recall")
  }

  test("dedup_embed pairs all meet the cosine threshold and are canonical") {
    val d = VectorOps.dedupEmbed(spark, sfDir)
    assert(d.filter(col("score_e6") < 400000).count() == 0)
    assert(d.filter(col("a_id") >= col("b_id")).count() == 0)
  }

  test("ann_index_append: merge equals recompute at FULL index shape (vectors and norms included)") {
    // the gate proves the 3-column key projection; this pins the whole
    // searchable index row (q, n2 included) so an appended index is
    // interchangeable with a from-scratch build for stream_ann
    graft.functions.GraftFunctions.register(spark)
    val all = Tables.embeddings(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("vec_id"), col("band_idx").cast("long"), col("bucket"),
          col("n2"), expr("cast(q as array<bigint>)").cast("string"))
        .collect().map(_.toSeq.mkString("|")).toSet
    val appended = VectorOps.appendBucketIndex(
      VectorOps.bucketedOf(VectorOps.quantizePlan(
        all.filter(col("vec_id") % 10 =!= 7)), 4, 4),
      all.filter(col("vec_id") % 10 === 7))
    val scratch = VectorOps.bucketedOf(VectorOps.quantizePlan(all), 4, 4)
    assert(rows(appended) == rows(scratch))
    assert(rows(appended).nonEmpty)
  }
}
