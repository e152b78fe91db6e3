package graft

import graft.sources.BucketedTable
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {

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
