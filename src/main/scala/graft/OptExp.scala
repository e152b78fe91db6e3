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
