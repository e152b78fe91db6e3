package graft

import org.apache.spark.sql.functions._

/** One-time generator of the mm_pipeline expectation parquet
  * (committed at [[graft.operators.Multimodal.MmExpectedPath]]): runs
  * the real decode over EVERY test corpus and stores the fixed-point
  * frame/thumbnail checksums keyed by (doc_id, md5-hex of the doc
  * text, frame_idx). The oracle joins this against the current
  * corpus's documents on BOTH keys, so a row only matches when the
  * document it was derived from is byte-identical — corpora sharing a
  * doc_id with different text cannot cross-match.
  *
  * Re-run (sbt "runMain graft.MmExpected") whenever the corpora or
  * the feature definition change; the correctness gate then fails
  * loudly until the committed file is refreshed, which is the point —
  * it is a regression pin for the codec arm, while the metadata arm
  * of the oracle is re-derived in pure SQL each run.
  */
object MmExpected {
  def main(args: Array[String]): Unit = {
    val out =
      if (args.nonEmpty) args(0) else graft.operators.Multimodal.MmExpectedPath
    val dirs =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/root/repo/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val frames = dirs.map { d =>
      graft.operators.Multimodal.features(spark, d).toDF()
        .join(Tables.documents(spark, d)
          .select(col("doc_id"), md5(col("text")).as("seed_hex")), "doc_id")
        .select("doc_id", "seed_hex", "frame_idx", "dim", "checksum", "thumb_checksum")
    }.reduce(_ unionByName _).distinct()
    frames.coalesce(1).write.mode("overwrite").parquet(out)
    println(s"[mm-expected] wrote ${spark.read.parquet(out).count()} rows to $out")
    spark.stop()
  }
}
