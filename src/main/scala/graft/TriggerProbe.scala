package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev measurement main for stream_join_outer's trigger sizing (the
  * round-7 verdict's attribution ask): the gate runs the join as ONE
  * AvailableNow batch off a single parquet file, so the watermark
  * only advances at stream end and every null-extension drains in the
  * final batch — 48 s at sf1 reflects single-batch ingestion, not
  * steady state. This probe re-lands the same events as `nFiles`
  * time-ordered files and streams them with `maxFilesPerTrigger`,
  * measuring batches-to-drain, wall time, and how many unmatched
  * clicks have null-extended by termination — the numbers PLANS.md
  * cites for production trigger guidance.
  *
  * Usage: sbt "runMain graft.TriggerProbe [sfDir] [nFiles] [mft...]"
  */
object TriggerProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nFiles = if (args.length > 1) args(1).toInt else 16
    val mfts = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(16, 4, 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // land the corpus as nFiles TIME-RANGED files. Range partition N
    // holds the N-th time slice and names part-0000N — but the file
    // SOURCE picks files by MODIFICATION time, and parallel write
    // tasks finish in arbitrary order, so the mtimes must be restamped
    // in range order or the "arrival" order is shuffled and the
    // watermark drops whole out-of-order files as late (measured:
    // emissions collapsed 4× at mft=1 before the restamp)
    val staged = java.nio.file.Files.createTempDirectory("graft_probe_in_").toString
    val events = Tables.events(spark, sfDir)
    events.repartitionByRange(nFiles, col("ts_ms"))
      .write.mode("overwrite").parquet(staged)
    val parts = new java.io.File(staged).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.setLastModifiedTime(f.toPath,
        java.nio.file.attribute.FileTime.fromMillis(1704067200000L + i * 1000L))
    }
    val total = events.count()

    mfts.foreach { mft =>
      val chk = java.nio.file.Files.createTempDirectory("graft_probe_chk_").toString
      val rawSchema = spark.read.parquet(staged).schema
      val stream = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", mft).parquet(staged)
      var batches = 0
      var emitted = 0L
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamImport.joinOuterStream(stream)
        .select(col("click_id"), coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .foreachBatch { (b: DataFrame, _: Long) =>
          batches += 1
          emitted += b.count()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[trigger-probe] sf=$sfDir files=$nFiles maxFilesPerTrigger=$mft " +
        f"batches=$batches wall=$wall%.1fs rows_emitted=$emitted events=$total")
    }
    spark.stop()
  }
}
