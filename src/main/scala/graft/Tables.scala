package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test corpus
  * (TESTDATA.md). One call = one parquet scan; column pruning and
  * filter pushdown happen in the caller's plan, so loaders stay thin.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` has shipped in two physical shapes across corpus
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader only accepts as a raw long via the legacy conf) and plain
    * TIMESTAMP(MICROS). Normalize either to epoch millis (`ts_ms`) —
    * the same FLOOR the DuckDB oracle's `epoch_ms(ts)` and Spark's
    * `unix_millis` produce, including for pre-epoch timestamps (a
    * plain `div` truncates toward zero and would diverge there; the
    * explicit floorDiv below stays exact where `floor(ts/1e6)` on a
    * double would lose ns-scale long precision past 2^53).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEvents(load(spark, dir, "events"))
  }

  /** The ts→millis normalization contract, shared by the batch loader
    * and the streaming source (divergence here would split the two
    * paths that answer one oracle). Type-adaptive: a LONG `ts` is
    * epoch NANOS (the legacy-conf read of TIMESTAMP(NANOS) files); a
    * timestamp `ts` converts via `unix_millis` — for the NTZ shape the
    * wall-clock is UTC by the corpus contract, which the cast honors
    * because [[Graft.session]] pins the session time zone to UTC.
    */
  def normalizeEvents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val tsMs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("(ts div 1000000) - (case when ts % 1000000 < 0 then 1 else 0 end)")
      case org.apache.spark.sql.types.TimestampNTZType =>
        expr("unix_millis(cast(ts as timestamp))")
      case _ => expr("unix_millis(ts)")
    }
    raw.withColumn("ts_ms", tsMs).drop("ts")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Whether [[spread]] is active (env `SPARK_GRAFT_SPREAD_INPUT`,
    * default on). Off is for source layouts whose scans already plan
    * enough non-empty splits — there the exchange is a redundant pass
    * over the frame.
    */
  private val SpreadInput: Boolean =
    sys.env.get("SPARK_GRAFT_SPREAD_INPUT").forall(!_.equalsIgnoreCase("off"))

  /** Fan a scan out across the session's cores BEFORE heavy row-local
    * work (guide §2.5 input skew). The corpus ships documents /
    * embeddings as single-row-group parquet, so a bare scan plans ONE
    * non-empty split — every row-local stage below the first exchange
    * (codec synthesis/decode, tokenize + shingle + hash fronts) then
    * runs serially no matter how many cores the session has (measured:
    * the documents-front rows' 8c/32c sf1 ratios sat at 0.84–1.05).
    * The exchange is deterministic (hash of `key` — safe under task
    * retry, §2.5) and moves only the frame's own (narrow, projected)
    * bytes once; the heavy derived work downstream runs at session
    * parallelism. Apply at HEAVY front-ends only — row-local-cheap
    * operators keep their no-shuffle shape (spec-pinned).
    */
  def spread(df: DataFrame, key: String): DataFrame =
    if (!SpreadInput) df
    else df.repartition(
      df.sparkSession.sparkContext.defaultParallelism,
      org.apache.spark.sql.functions.col(key))
}
