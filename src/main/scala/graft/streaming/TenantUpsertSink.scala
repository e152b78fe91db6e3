package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Keyed upsert sink with tenant partition routing — the batch-side
  * mirror of the reference's per-tenant RDBMS writes
  * (RoutingDataSource + upsert-by-instance-key repositories). The
  * zero-egress container has no RDBMS, so the "table" is a parquet
  * directory partitioned by tenant; in production this foreachBatch
  * body is a JDBC MERGE per tenant partition (same contract:
  * idempotent by key, latest batch wins).
  *
  * Upsert = anti-join existing rows on the key, union the new batch,
  * atomic swap via staging-dir rename. Safe for the micro-batch
  * cadence of foreachBatch (one writer per query); re-running a batch
  * converges to the same state — the idempotency the reference gets
  * from JPA merge semantics.
  */
object TenantUpsertSink {

  def upsert(tableDir: String, batch: DataFrame, key: String): Unit = {
    val spark = batch.sparkSession
    val dir = new java.io.File(tableDir)
    val staging = new java.io.File(tableDir + ".staging")
    val merged =
      if (dir.exists()) {
        val existing = spark.read.parquet(tableDir)
        existing.join(batch.select(key).distinct(), Seq(key), "left_anti")
          .unionByName(batch)
      } else batch
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy("tenant")
      .parquet(staging.getPath)
    // swap: the read above is fully materialized by the write, so the
    // old generation can be dropped and replaced atomically-enough for
    // a single-writer stream.
    if (dir.exists()) delete(dir)
    if (!staging.renameTo(dir))
      throw new java.io.IOException(s"rename $staging -> $dir failed")
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    if (!f.delete()) throw new java.io.IOException(s"delete $f failed")
  }
}
