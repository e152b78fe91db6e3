package graft

// throwaway stage profile for ann_lsh (deleted after use)
object DebugLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    functions.GraftFunctions.register(spark)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val secs = (for {a <- i.completionTime; b <- i.submissionTime} yield (a - b) / 1e3)
          .getOrElse(-1.0)
        val recs = i.taskMetrics.inputMetrics.recordsRead +
          i.taskMetrics.shuffleReadMetrics.recordsRead
        if (secs > 0.5) println(
          f"[stage] ${i.stageId} tasks=${i.numTasks} wall=$secs%.1f s recsIn=$recs  ${i.name.take(60)}")
      }
    })
    val t0 = System.nanoTime()
    val r = operators.VectorOps.annLsh(spark, sfDir)
    val n = r.count()
    println(f"[t] ann_lsh total ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
    spark.stop()
  }
}
