package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B harness for optimization-round experiments: times named
  * candidate variants with the EXACT Bench.timeOne protocol (quiesce,
  * fresh child session, noop sink, 3 reps, lower median) so a variant's
  * number is directly comparable to a BENCH_ONLY row. Not part of any
  * shipped query path.
  *
  * Usage: runMain graft.OptExp <sfDir> <exp1,exp2,...>
  */
object OptExp {

  private def variants(sfDir: String): Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- sort-sampling double-execution probes -----------------------
    // as-is rows come from SparkEntry.queries via the name alone
    "imp_raw_ingest_nosort" -> ((s: SparkSession, d: String) =>
      graft.sources.RawIngest.parse(graft.sources.RawIngest.rawRecords(s, d))),
    "imp_raw_ingest_cp" -> ((s: SparkSession, d: String) => {
      val parsed = Scratch.cp(
        graft.sources.RawIngest.parse(graft.sources.RawIngest.rawRecords(s, d)))
      parsed.orderBy("record_id")
    }),
    "text_winnow_nosort" -> ((s: SparkSession, d: String) => {
      functions.GraftFunctions.register(s)
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("hs", expr(
          "graft_hash60_all(transform(sequence(0, greatest(size(toks) - 5, 0)), " +
            "i -> concat_ws(' ', slice(toks, i + 1, 5))))"))
        .select(col("doc_id"), explode(expr("graft_winnow(hs, 4)")).as("fp"))
    }),
    "text_winnow_cp" -> ((s: SparkSession, d: String) => {
      functions.GraftFunctions.register(s)
      val fps = Scratch.cp(Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("hs", expr(
          "graft_hash60_all(transform(sequence(0, greatest(size(toks) - 5, 0)), " +
            "i -> concat_ws(' ', slice(toks, i + 1, 5))))"))
        .select(col("doc_id"), explode(expr("graft_winnow(hs, 4)")).as("fp")))
      fps.orderBy("doc_id", "fp")
    }),
    // --- components-closure phase split (r19) -------------------------
    "comp_pairs" -> ((s: SparkSession, d: String) =>
      operators.TextOps.minhashCandidates(s, d)),
    "comp_rounds" -> ((s: SparkSession, d: String) => {
      val r = operators.Components.dedupComponents(s, d)
      System.err.println(s"[optexp] comp rounds=${operators.Components.lastRounds.get()}")
      r
    }),
    // the r18 loop (count + exceptAll probe, converges one round late)
    // inlined for a within-JVM A/B against the shipped star-probe loop
    "comp_closure_old" -> ((s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).select("doc_id")
      val pairs = operators.TextOps.minhashCandidates(s, d)
      var cur = Scratch.cp(pairs.select(
          greatest(col("a_id"), col("b_id")).as("u"),
          least(col("a_id"), col("b_id")).as("v"))
        .filter(col("u") =!= col("v")).distinct())
      var curCount = cur.count()
      var converged = false
      var rounds = 0
      while (!converged && rounds < 50) {
        val sym = cur.select(col("u"), col("v"))
          .union(cur.select(col("v").as("u"), col("u").as("v")))
        val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("mn"), col("u")).as("m"))
        val ls = sym.join(mins, "u").filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v")).distinct()
        val mins2 = ls.groupBy("u").agg(min(col("v")).as("m"))
        val next = Scratch.cp(ls.join(mins2, "u")
          .select(col("v").as("n"), col("m"))
          .filter(col("n") =!= col("m"))
          .select(col("n").as("u"), col("m").as("v"))
          .union(mins2.select(col("u"), col("m").as("v")))
          .distinct())
        val nextCount = next.count()
        converged = nextCount == curCount && next.exceptAll(cur).isEmpty
        Scratch.free(cur)
        cur = next
        curCount = nextCount
        rounds += 1
      }
      System.err.println(s"[optexp] old-loop rounds=$rounds")
      val roots = cur.groupBy(col("u").as("doc_id")).agg(min("v").as("component"))
      val labels = docs.join(roots, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
      val lbl = Scratch.seal(labels, cur)
      Scratch.free(pairs)
      lbl.select(col("doc_id"), col("component"),
          (col("doc_id") === col("component")).as("keep"))
        .orderBy("doc_id")
    }),
    // --- src_out_of_order phase split (r19): where do 5-10 s/trigger
    // go — the source+parse, the FMGWS buffer fold, or the sink? All
    // variants pin the bench's stream geometry (8 shuffle partitions).
    "ooo_src_only" -> ((s: SparkSession, d: String) => {
      s.conf.set("spark.sql.shuffle.partitions", 8)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = s.read.parquet(s"$d/events.parquet").schema
      val stream = Tables.normalizeEvents(s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(d))
      val work = java.nio.file.Files.createTempDirectory("graft_ooo_").toString
      val q = streaming.StreamImport.toRecs(stream).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/chk")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").format("noop").save() }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.range(1).toDF("x")
    }),
    "ooo_fold_nosink" -> ((s: SparkSession, d: String) => {
      s.conf.set("spark.sql.shuffle.partitions", 8)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = s.read.parquet(s"$d/events.parquet").schema
      val stream = Tables.normalizeEvents(s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(d))
      val work = java.nio.file.Files.createTempDirectory("graft_ooo_").toString
      val q = streaming.OutOfOrder.routed(stream).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/chk")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").format("noop").save() }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.range(1).toDF("x")
    }),
    "ooo_asis" -> ((s: SparkSession, d: String) => {
      s.conf.set("spark.sql.shuffle.partitions", 8)
      SparkEntry.queries("src_out_of_order")(s, d)
    }),
    // --- ann_pq stage timers (r19): which of the 8 sequential driver
    // actions (quantize cp, IVF Lloyd, assignment seal, PQ seeds, PQ
    // Lloyd, index write, probe topk) carries the 5 s?
    "pq_stages" -> ((s: SparkSession, d: String) => {
      functions.GraftFunctions.register(s)
      def t[T](name: String)(b: => T): T = {
        val t0 = System.nanoTime(); val r = b
        System.err.println(f"[optexp] pq $name%-12s ${(System.nanoTime() - t0) / 1e9}%5.2fs")
        r
      }
      import operators.VectorOps._
      val v = t("quantize_cp") { Scratch.cp(quantizePlan(Tables.embeddings(s, d))) }
      val assigned = t("assign_seal") { cellAssignmentsOf(v, 16, 2, 1, 0) }
      val base = assigned.filter(col("crnk") === 1)
      val subDim = 64 / 8
      var cb = t("pq_seeds") { pqSeedsOf(base, subDim, 8, 16) }
      cb = t("pq_lloyd") { pqLloydStep(base, cb, 8, subDim, 16) }
      val book = s.sparkContext.broadcast(
        graft.functions.PqBook.build(cb, 8, subDim, 16))
      val table = "graft_pqidx_" + java.util.UUID.randomUUID().toString.replace("-", "")
      t("index_write") { graft.sources.BucketedTable.write(
        pqIndexOf(base, book), table, "cell", 16) }
      val corpus = graft.sources.BucketedTable.read(s, table)
      val (_, _, topk) = annPqProbeFrames(assigned, corpus, book,
        16, 2, 3, 8, 16, "direct")
      val out = t("probe_seal") { Scratch.seal(topk, assigned) }
      t("sort_noop") { out.orderBy("q_id", "rnk")
        .write.mode("overwrite").format("noop").save() }
      s.sql(s"DROP TABLE IF EXISTS $table")
      book.destroy()
      s.range(1).toDF("x")
    }),
    // --- dedup_ngram_prod A/B (r19, VERDICT item 8): the per-doc
    // shingle-set aggregate (shuffle + collect_list over the capped
    // frame) is a subtree of BOTH verify-join branches — Spark plans
    // no cross-branch CSE, so it executes twice. Variant cp's it once.
    "ngram_prod_setscp" -> ((s: SparkSession, d: String) => {
      functions.GraftFunctions.register(s)
      val cand = operators.TextOps.minhashCandidates(s, d).select("a_id", "b_id")
      val capped = operators.TextOps.cappedShingles(s, d)
      val sets = Scratch.cp(capped.groupBy("doc_id")
        .agg(collect_list(col("h")).as("hs")))
      Scratch.free(capped) // sets carries everything the joins need
      val verified = cand
        .join(sets.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
        .join(sets.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
        .withColumn("shared", size(array_intersect(col("ha"), col("hb")))
          .cast(org.apache.spark.sql.types.LongType))
        .withColumn("jac_e4",
          expr("10000 * shared DIV (size(ha) + size(hb) - shared)"))
        .filter(col("jac_e4") >= 3000)
        .select("a_id", "b_id", "jac_e4")
      Scratch.seal(verified, sets).orderBy("a_id", "b_id")
    }),
    // plan-shape probe: the UNSEALED verify-join plan (the gate query
    // seals it, so the dump shows only the stub) — checks whether the
    // two sets-agg branches already collapse to a ReusedExchange
    "ngram_prod_plan" -> ((s: SparkSession, d: String) => {
      functions.GraftFunctions.register(s)
      val cand = operators.TextOps.minhashCandidates(s, d).select("a_id", "b_id")
      val capped = operators.TextOps.cappedShingles(s, d)
      val sets = capped.groupBy("doc_id").agg(collect_list(col("h")).as("hs"))
      val verified = cand
        .join(sets.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
        .join(sets.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
        .withColumn("shared", size(array_intersect(col("ha"), col("hb")))
          .cast(org.apache.spark.sql.types.LongType))
        .withColumn("jac_e4",
          expr("10000 * shared DIV (size(ha) + size(hb) - shared)"))
        .filter(col("jac_e4") >= 3000)
        .select("a_id", "b_id", "jac_e4")
      verified.write.mode("overwrite").format("noop").save()
      System.err.println("[optexp] ngram_prod unsealed EXECUTED plan:\n" +
        verified.queryExecution.executedPlan.toString)
      Scratch.free(capped)
      s.range(1).toDF("x")
    }),
    // cpSorted eager-vs-lazy A/B (r19): the eager barrier pays a
    // dedicated materialize job, then the sort's range-sample job
    // re-scans the cache; a LAZY checkpoint folds the body into the
    // sample job (RangePartitioner.sketch scans every partition, so
    // the cache is complete before the shuffle job) — one fewer job
    // per barrier query, body still executed exactly once
    "raw_ingest_cplazy" -> ((s: SparkSession, d: String) => {
      val parsed = Scratch.cpLazy(
        graft.sources.RawIngest.parse(graft.sources.RawIngest.rawRecords(s, d)))
      parsed.orderBy("record_id")
    }),
    "mm_pipeline_cplazy" -> ((s: SparkSession, d: String) => {
      functions.GraftFunctions.register(s)
      Scratch.cpLazy(operators.Multimodal.features(s, d).toDF())
        .orderBy("doc_id", "frame_idx")
    }),
    // pair-enumeration A/B (r19): replace ngramPairsOf's h-keyed
    // SELF-JOIN (Exchange+Sort on each side + SortMergeJoin) with ONE
    // groupBy(h) + row-local pair combinations — the per-h doc lists
    // are df-capped (<= 100), so combination explode is bounded and the
    // pair multiset is identical (each (a,b,h) with a<b appears once)
    "ngram_pairs_grouped" -> ((s: SparkSession, d: String) => {
      functions.GraftFunctions.register(s)
      import org.apache.spark.sql.types.LongType
      val capped = operators.TextOps.cappedShingles(s, d)
      val counts = capped.groupBy("doc_id").agg(count(lit(1)).cast(LongType).as("n_sh"))
      val shared = capped.groupBy("h")
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> " +
            "transform(slice(ds, i + 2, size(ds) - i - 1), " +
            "y -> named_struct('a_id', x, 'b_id', y))))")).as("p"))
        .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
        .agg(count(lit(1)).cast(LongType).as("shared"))
      val pairs = shared
        .join(counts.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "na"), "a_id")
        .join(counts.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
        .withColumn("jac_e4", expr("10000 * shared DIV (na + nb - shared)"))
        .filter(col("jac_e4") >= 3000)
        .select("a_id", "b_id", "jac_e4")
      Scratch.seal(pairs, capped).orderBy("a_id", "b_id")
    }),
    // one-shot equivalence check: grouped enumeration vs the shipped
    // self-join, exact row-set equality both directions
    "ngram_pairs_check" -> ((s: SparkSession, d: String) => {
      functions.GraftFunctions.register(s)
      val a = SparkEntry.queries("dedup_ngram")(s, d).collect().map(_.toSeq).toSet
      val b = variants(d)("ngram_pairs_grouped")(s, d).collect().map(_.toSeq).toSet
      System.err.println(s"[optexp] ngram check: join=${a.size} grouped=${b.size} " +
        s"onlyJoin=${(a -- b).size} onlyGrouped=${(b -- a).size}")
      require(a == b, "grouped pair enumeration diverged from the self-join")
      s.range(1).toDF("x")
    }),
    // counts-once A/B for the symmetric detector family: ngramPairsOf
    // computes the per-doc count aggregate once per join side
    "ngram_countscp" -> ((s: SparkSession, d: String) => {
      functions.GraftFunctions.register(s)
      val capped = operators.TextOps.cappedShingles(s, d)
      val counts = Scratch.cp(capped.groupBy("doc_id")
        .agg(count(lit(1)).cast(org.apache.spark.sql.types.LongType).as("n_sh")))
      val shared = capped.as("a").join(capped.as("b").hint("merge"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).cast(org.apache.spark.sql.types.LongType).as("shared"))
      val pairs = shared
        .join(counts.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "na"), "a_id")
        .join(counts.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
        .withColumn("jac_e4", expr("10000 * shared DIV (na + nb - shared)"))
        .filter(col("jac_e4") >= 3000)
        .select("a_id", "b_id", "jac_e4")
      Scratch.seal(pairs, capped, counts).orderBy("a_id", "b_id")
    }))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(variants(sfDir).keys.toSeq.sorted)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.all.foreach(t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () })
    def timeOne(fn: (SparkSession, String) => DataFrame): Double = {
      Scratch.releaseAll()
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(150)
      val session = spark.newSession()
      functions.GraftFunctions.register(session)
      val t0 = System.nanoTime()
      fn(session, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val all = variants(sfDir) ++ SparkEntry.queries
    names.foreach { n =>
      val fn = all(n)
      val ts = (1 to 3).map(_ => timeOne(fn))
      println(f"[optexp] $n%-28s median=${ts.sorted.apply(1)}%6.2f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
