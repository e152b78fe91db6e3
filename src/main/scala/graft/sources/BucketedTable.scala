package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
