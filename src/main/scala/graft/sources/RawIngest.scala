package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Raw export-record ingest: the reference consumes raw JSON strings
  * off the subject and JsonPath-extracts routing + entity fields
  * (NatsConsumer.listen:39-106 with JsonPathReader; `$.valueType`
  * routing, `$.value.workflowInstanceKey` keys, bpmnProcessId split).
  * `parse` is that path as one codegen'd projection — shared by the
  * batch demo operator and the graft-queue streaming source.
  */
object RawIngest {

  /** Parse + route raw JSON record strings (column `value`). DEPLOYMENT
    * records are dropped (the reference ignores them, NatsConsumer:47).
    */
  def parse(raw: DataFrame): DataFrame =
    raw.select(
      get_json_object(col("value"), "$.valueType").as("value_type"),
      get_json_object(col("value"), "$.timestamp").cast(LongType).as("ts_ms"),
      get_json_object(col("value"), "$.value.workflowInstanceKey").cast(LongType).as("instance_key"),
      get_json_object(col("value"), "$.value.bpmnProcessId").as("bpmn"),
      get_json_object(col("value"), "$.value.recordId").cast(LongType).as("record_id"),
      get_json_object(col("value"), "$.value.payload.k").cast(LongType).as("k"))
      .filter(col("value_type") =!= "DEPLOYMENT")
      .select(
        col("record_id"), col("value_type"), col("instance_key"),
        substring_index(col("bpmn"), "-", 1).as("process_id"),
        substring_index(col("bpmn"), "-", -1).as("tenant"),
        col("ts_ms"), col("k"))

  /** Synthesize the raw subject payloads from the events table — the
    * Zeebe-export-shaped JSON a NATS subject would carry.
    */
  def rawRecords(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(to_json(struct(
      when(col("event_type").isin("click", "view", "purchase"), "VARIABLE")
        .when(col("event_type") === "signup", "PROCESS_INSTANCE")
        .otherwise("DEPLOYMENT").as("valueType"),
      col("ts_ms").as("timestamp"),
      struct(
        col("user_id").as("workflowInstanceKey"),
        concat(col("event_type"), lit("-t"), (col("user_id") % 10).cast(LongType)).as("bpmnProcessId"),
        col("event_id").as("recordId"),
        struct(get_json_object(col("props"), "$.k").cast(LongType).as("k")).as("payload")
      ).as("value"))).as("value"))

  /** Batch demo: events → raw JSON strings → parse/route/split — the
    * full NatsConsumer string path, oracle-checked (both engines build
    * and re-extract their own JSON, so only extraction semantics are
    * compared, not serialization formats).
    */
  def impRawIngest(spark: SparkSession, dir: String): DataFrame =
    parse(rawRecords(spark, dir)).orderBy("record_id")

  def impRawIngestSql: String =
    """WITH raw AS (
      |  SELECT to_json(struct_pack(
      |      valueType := CASE WHEN event_type IN ('click','view','purchase') THEN 'VARIABLE'
      |                        WHEN event_type = 'signup' THEN 'PROCESS_INSTANCE'
      |                        ELSE 'DEPLOYMENT' END,
      |      "timestamp" := epoch_ms(ts),
      |      value := struct_pack(
      |        workflowInstanceKey := user_id,
      |        bpmnProcessId := CONCAT(event_type, '-t', CAST(user_id % 10 AS VARCHAR)),
      |        recordId := event_id,
      |        payload := struct_pack(k := CAST(json_extract_string(props,'$.k') AS BIGINT))))) AS value
      |  FROM events)
      |SELECT
      |  CAST(json_extract_string(value, '$.value.recordId') AS BIGINT) AS record_id,
      |  json_extract_string(value, '$.valueType') AS value_type,
      |  CAST(json_extract_string(value, '$.value.workflowInstanceKey') AS BIGINT) AS instance_key,
      |  split_part(json_extract_string(value, '$.value.bpmnProcessId'), '-', 1) AS process_id,
      |  split_part(json_extract_string(value, '$.value.bpmnProcessId'), '-', 2) AS tenant,
      |  CAST(json_extract_string(value, '$.timestamp') AS BIGINT) AS ts_ms,
      |  CAST(json_extract_string(value, '$.value.payload.k') AS BIGINT) AS k
      |FROM raw
      |WHERE json_extract_string(value, '$.valueType') <> 'DEPLOYMENT'
      |ORDER BY record_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "imp_raw_ingest" -> (impRawIngest _))

  def oracles: Map[String, String] = Map(
    "imp_raw_ingest" -> impRawIngestSql)
}
