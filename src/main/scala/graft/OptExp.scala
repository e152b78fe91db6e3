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
