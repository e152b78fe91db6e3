package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-side query API: composable attribute predicates mirroring the
  * reference's JPA `Specification` builders
  * (entity/transfer/TransferSpecs.java — between / later / earlier /
  * match). Each spec is a plain `Column` predicate, so composed specs
  * stay declarative and push down to the scan (the reference composes
  * `Specification.and`; here `&&` on Columns).
  */
object Specs {

  def between(attr: String, from: Column, to: Column): Column =
    col(attr) >= from && col(attr) <= to

  def later(attr: String, t: Column): Column = col(attr) >= t

  def earlier(attr: String, t: Column): Column = col(attr) <= t

  def matchEq(attr: String, v: Column): Column = col(attr) === v

  def all(specs: Column*): Column =
    specs.reduceOption(_ && _).getOrElse(lit(true))

  /** Apply composed specs to an entity DataFrame. */
  def query(entity: DataFrame, specs: Column*): DataFrame =
    entity.filter(all(specs: _*))

  // --- driver-checked query instances over the transfers entity ---

  // 2024-01-08 / 2024-01-22 UTC, inside the corpus' Jan 2024 span;
  // T2 = 2024-02-01, past most completions (the earlier() bound must
  // filter without zeroing the result).
  private val T0 = 1704672000000L
  private val T1 = 1705881600000L
  private val T2 = 1706745600000L

  /** `between(startedAt, from, to)` over materialized transfers. */
  def qSpecsBetween(spark: SparkSession, dir: String): DataFrame =
    query(ImporterCore.transfers(spark, dir),
      between("started_ms", lit(T0), lit(T1)))
      .select("transfer_key", "tenant", "started_ms", "status")
      .orderBy("transfer_key")

  def qSpecsBetweenSql: String =
    s"""WITH t AS (
       |${ImporterCore.transfersSqlCte})
       |SELECT transfer_key, tenant, started_ms, status FROM t
       |WHERE started_ms >= $T0 AND started_ms <= $T1
       |ORDER BY transfer_key""".stripMargin

  /** `match(status) AND later(completedAt) AND earlier(completedAt)`
    * over transfers — all four reference builders (between / later /
    * earlier / match, TransferSpecs.java) gate-covered between this
    * and qSpecsBetween.
    */
  def qSpecsMatch(spark: SparkSession, dir: String): DataFrame =
    query(ImporterCore.transfers(spark, dir),
      matchEq("status", lit("COMPLETED")),
      later("completed_ms", lit(T0)),
      earlier("completed_ms", lit(T2)))
      .select("transfer_key", "tenant", "completed_ms", "amount", "status")
      .orderBy("transfer_key")

  def qSpecsMatchSql: String =
    s"""WITH t AS (
       |${ImporterCore.transfersSqlCte})
       |SELECT transfer_key, tenant, completed_ms, amount, status FROM t
       |WHERE status = 'COMPLETED' AND completed_ms >= $T0 AND completed_ms <= $T2
       |ORDER BY transfer_key""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_specs_between" -> (qSpecsBetween _),
    "q_specs_match" -> (qSpecsMatch _))

  def oracles: Map[String, String] = Map(
    "q_specs_between" -> qSpecsBetweenSql,
    "q_specs_match" -> qSpecsMatchSql)
}
