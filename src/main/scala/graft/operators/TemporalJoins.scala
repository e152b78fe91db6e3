package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Temporal join operators Spark's API lacks as primitives, re-expressed
  * Spark-first (SURVEY §2 preference order (a): compose existing ops).
  *
  * As-of join: for each left event, the LATEST right event with
  * right.ts <= left.ts per key. Instead of a per-row subquery (the
  * naive O(n²)) or a custom physical operator, the composition is the
  * classic union + carry-forward: tag both sides, sort within the key
  * by (ts, side), and carry the right side's payload forward with
  * `last(_, ignoreNulls)` — ONE shuffle on the key, linear work,
  * exactly the plan a dedicated as-of SparkPlan would produce. The
  * oracle is DuckDB's native ASOF JOIN, so the semantics are pinned
  * against a first-class implementation.
  */
object TemporalJoins {

  /** For each purchase, the latest click at-or-before it per user.
    * Clicks pre-dedup to one per (user, ts) — ASOF ties at the same
    * timestamp are engine-ambiguous otherwise.
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val byUserTs = Window.partitionBy("user_id", "ts_ms").orderBy(col("event_id").desc)
    val clicks = e.filter(col("event_type") === "click")
      .withColumn("rn", row_number().over(byUserTs)).filter(col("rn") === 1)
      .select(col("user_id"), col("ts_ms"),
        lit(0).as("side"), lit(null).cast(LongType).as("p_id"),
        dec2(col("value")).as("click_value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms"),
        lit(1).as("side"), col("event_id").as("p_id"),
        lit(null).cast("decimal(18,2)").as("click_value"))
    // at equal ts the click sorts first => inclusive (<=) semantics
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ms"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("asof_value", last(col("click_value"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(when(col("side") === 0, col("ts_ms")), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("asof_value").isNotNull)
      .select(col("p_id").as("purchase_id"), col("user_id"),
        col("asof_ts").as("click_ms"),
        moneyStr(col("asof_value")).as("click_value"))
      .orderBy("purchase_id")
  }

  def qAsofJoinSql: String =
    """WITH clicks AS (
      |  SELECT user_id, epoch_ms(ts) AS c_ms, CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events WHERE event_type = 'click'
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, epoch_ms(ts)
      |                             ORDER BY event_id DESC) = 1),
      |purchases AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS p_ms
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, p.user_id, c.c_ms AS click_ms,
      |  CAST(CAST(c.v AS DECIMAL(38,2)) AS VARCHAR) AS click_value
      |FROM purchases p ASOF JOIN clicks c
      |  ON p.user_id = c.user_id AND p.p_ms >= c.c_ms
      |ORDER BY purchase_id""".stripMargin

  /** Range join: events falling inside each user session's interval
    * (sessions from the gap-based sessionizer). Equi-join on the key
    * plus a range predicate — Spark turns this into the key join with
    * a pushed residual filter, no nested loop.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val sessions = Analytics.qSessionize(spark, dir)
      .select(col("user_id"), col("session_seq"), col("start_ms"), col("end_ms"))
    val errors = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_ms"))
    errors.join(sessions, Seq("user_id"))
      .filter(col("ts_ms").between(col("start_ms"), col("end_ms")))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).cast(LongType).as("n_errors"))
      .orderBy("user_id", "session_seq")
  }

  def qRangeJoinSql: String =
    s"""WITH sessions AS (
       |${Analytics.qSessionizeSql.replace("ORDER BY user_id, session_seq", "")}),
       |err AS (
       |  SELECT user_id, event_id, epoch_ms(ts) AS ms
       |  FROM events WHERE event_type = 'error')
       |SELECT e.user_id, s.session_seq, COUNT(*) AS n_errors
       |FROM err e JOIN sessions s
       |  ON e.user_id = s.user_id AND e.ms BETWEEN s.start_ms AND s.end_ms
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _))

  def oracles: Map[String, String] = Map(
    "q_asof_join" -> qAsofJoinSql,
    "q_range_join" -> qRangeJoinSql)
}
