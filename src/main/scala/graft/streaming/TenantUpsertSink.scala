package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Keyed upsert sink with tenant partition routing — the batch-side
  * mirror of the reference's per-tenant RDBMS writes
  * (RoutingDataSource + upsert-by-instance-key repositories). The
  * zero-egress container has no RDBMS, so the "table" is a parquet
  * directory partitioned by tenant; in production this foreachBatch
  * body is a JDBC MERGE per tenant partition (same contract:
  * idempotent by key, latest batch wins).
  *
  * Crash safety: generations + an atomically-renamed pointer file.
  * Each upsert writes a NEW generation directory (anti-join current on
  * the key, union the batch, `partitionBy(tenant)`), then swings
  * `_CURRENT` via write-temp + rename (atomic on POSIX). A crash at
  * any point leaves the previous pointer valid and the previous
  * generation intact, so re-running the batch converges — the
  * idempotency the reference gets from JPA merge semantics. Stale
  * generations are pruned best-effort after the swing.
  */
object TenantUpsertSink {

  private val Pointer = "_CURRENT"

  /** The table's current contents (empty frame semantics are the
    * caller's concern: returns None before the first upsert).
    */
  def readCurrent(spark: SparkSession, tableDir: String): Option[DataFrame] =
    currentGen(tableDir).map(g => spark.read.parquet(s"$tableDir/$g"))

  private def currentGen(tableDir: String): Option[String] = {
    val p = new java.io.File(tableDir, Pointer)
    if (p.exists()) Some(new String(java.nio.file.Files.readAllBytes(p.toPath)).trim)
    else None
  }

  def upsert(tableDir: String, batch: DataFrame, key: String): Unit = {
    val spark = batch.sparkSession
    // an empty batch would write a generation with ZERO parquet files
    // (only _SUCCESS) and poison every later schema-inferring read;
    // there is also nothing to change — skip
    if (batch.isEmpty) return
    new java.io.File(tableDir).mkdirs()
    val merged = readCurrent(spark, tableDir) match {
      case Some(existing) =>
        existing.join(batch.select(key).distinct(), Seq(key), "left_anti")
          .unionByName(batch)
      case None => batch
    }
    val gen = s"gen-${System.nanoTime()}"
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy("tenant")
      .parquet(s"$tableDir/$gen")
    // atomic pointer swing: write tmp, rename over _CURRENT
    val tmp = new java.io.File(tableDir, s"$Pointer.tmp")
    java.nio.file.Files.write(tmp.toPath, gen.getBytes)
    java.nio.file.Files.move(tmp.toPath, new java.io.File(tableDir, Pointer).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // best-effort prune of EVERY unreferenced generation — not just
    // the one superseded now: a crash between gen write and pointer
    // swing orphans a directory that no later upsert would otherwise
    // reclaim (single-writer, so nothing else can hold a stale gen).
    new java.io.File(tableDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-") && f.getName != gen)
      .foreach(delete)
  }

  private def delete(f: java.io.File): Unit = if (f.exists()) {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete()
  }
}
