package graft

import graft.sources.BucketedTable
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {

  test("partition pruning: a partition-key filter reads ONLY that partition's files") {
    // the third leg of the SURVEY §4 layout story next to pushdown and
    // bucketing: a `partitionBy` layout + partition-key predicate must
    // show up as PartitionFilters and scan a strict subset of files
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_prune_").toString
    Tables.events(spark, sfDir)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val all = spark.read.parquet(dir)
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.getOrElse(fail("no FileSourceScan in plan"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"partition filter missing from scan:\n$plan")
    val prunedFiles = scanOf(pruned).selectedPartitions.totalNumberOfFiles
    val allFiles = scanOf(all).selectedPartitions.totalNumberOfFiles
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"expected a strict file subset: pruned=$prunedFiles all=$allFiles")
    // and the pruned read still returns exactly the partition's rows
    assert(pruned.count() ==
      Tables.events(spark, sfDir).filter(col("event_type") === "purchase").count())
  }

  test("same-key bucketed tables join with ZERO exchanges (co-located join)") {
    val events = Tables.events(spark, sfDir)
    val perUser = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
    val lastType = events.groupBy("user_id")
      .agg(max("event_type").as("t"))
    BucketedTable.write(perUser, "graft_bkt_a", "user_id", 4)
    BucketedTable.write(lastType, "graft_bkt_b", "user_id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: broadcast would hide the property
      // under test (bucket co-location eliminating the shuffle)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTable.read(spark, "graft_bkt_a")
        .join(BucketedTable.read(spark, "graft_bkt_b"), "user_id")
      val rows = joined.collect()
      assert(rows.length == Tables.events(spark, sfDir).select("user_id").distinct().count())
      val plan = joined.queryExecution.executedPlan.toString.split("Initial Plan")(0)
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed same-key join should be exchange-free:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
