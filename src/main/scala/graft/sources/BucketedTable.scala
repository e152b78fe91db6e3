package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Co-located joins via bucketed tables (SURVEY §4: "bucketing for
  * co-located joins"). A fact table that joins repeatedly on the same
  * key should be WRITTEN bucketed on that key: both sides of a
  * same-key, same-bucket-count join then scan pre-partitioned,
  * pre-sorted files and the sort-merge join plans with ZERO exchanges
  * — the shuffle is paid once at write time, amortized over every
  * downstream join (the 100 TB pattern for dimension-conformed fact
  * joins; BucketedJoinSpec asserts the exchange-free plan).
  *
  * Bucket-count guidance at scale: pick so one bucket's largest
  * key-slice fits an executor's memory (the same sizing rule as
  * shuffle partitions), and keep it STABLE across tables that join —
  * mismatched counts re-shuffle the smaller side.
  */
object BucketedTable {

  /** Write as a bucketed+sorted managed table (metadata in the session
    * catalog; at scale this is the lakehouse catalog entry).
    */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Gate entry — the co-located-join ANSWER oracled, not just its
    * plan (BucketedJoinSpec pins the zero-exchange property; this
    * pins the rows): two per-user aggregates of the events corpus are
    * WRITTEN as same-key same-count bucketed tables, then joined on
    * the bucket key — at scale the join runs exchange-free off the
    * bucket layout, the shuffle paid once at write time. The answer
    * is identical to the unbucketed SQL join, which is exactly the
    * point: bucketing is a physical-layout optimization with zero
    * semantic surface, and the oracle proves it.
    *
    * Table names are per-invocation (UUID) and dropped after the join
    * materializes — bench reps and verify never collide.
    */
  def optBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.Tables.events(spark, dir)
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "")
    val (ta, tb) = (s"graft_bja_$suffix", s"graft_bjb_$suffix")
    import graft.functions.Portable.{dec2, moneyStr}
    val perUser = events.groupBy("user_id").agg(
      count(lit(1)).cast(LongType).as("n_events"),
      coalesce(moneyStr(sum(dec2(col("value")))), lit("")).as("sum_value"))
    val lastType = events.groupBy("user_id").agg(max("event_type").as("max_type"))
    write(perUser, ta, "user_id", 8)
    write(lastType, tb, "user_id", 8)
    try graft.Scratch.cp(
      read(spark, ta).join(read(spark, tb), "user_id")
        .select("user_id", "n_events", "sum_value", "max_type")
        .orderBy("user_id"))
    finally {
      spark.sql(s"DROP TABLE IF EXISTS $ta")
      spark.sql(s"DROP TABLE IF EXISTS $tb")
    }
  }

  def optBucketedJoinSql: String =
    """WITH a AS (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    COALESCE(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR), '') AS sum_value
      |  FROM events GROUP BY user_id),
      |b AS (SELECT user_id, MAX(event_type) AS max_type FROM events GROUP BY user_id)
      |SELECT a.user_id, a.n_events, a.sum_value, b.max_type
      |FROM a JOIN b USING (user_id) ORDER BY user_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("opt_bucketed_join" -> (optBucketedJoin _))

  def oracles: Map[String, String] =
    Map("opt_bucketed_join" -> optBucketedJoinSql)
}
