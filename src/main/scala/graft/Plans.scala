package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of the headline queries for
  * plan review (PLANS.md). Usage: runMain graft.Plans [sfDir].
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q1_pricing", "q3_shipping", "q5_regional", "q9_profit",
      "imp_entity_transfers", "imp_entity_incremental",
      "dedup_minhash", "dedup_ngram", "ann_bruteforce", "q_sessionize",
      "sketch_hll", "sketch_topk", "sketch_quantile", "text_bigram",
      "q4_priority", "q_pivot", "q_grouping_sets", "q_corr_subquery",
      "q_salted_agg", "text_repetition", "pipe_quota", "pipe_tokenize")
    names.foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      // collect() runs df's OWN QueryExecution (count() would build a
      // derived aggregate and leave this plan un-executed), so the
      // printed plan is the post-AQE executed one
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
