package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multi-dimensional data layout: Z-order (Morton) clustering keys —
  * the write-time organization that makes min/max data skipping work
  * on MORE THAN ONE predicate column (the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`). Range-partitioning + sorting
  * by a single column gives that column tight per-file min/max bounds
  * and leaves every other column's bounds spanning the whole domain;
  * interleaving the bits of two columns into one sort key bounds BOTH
  * — a conjunctive predicate on (user, time-bucket) then prunes files
  * on either or both dimensions. At 100 TB this is a WRITE-side
  * operator: `repartitionByRange(zval)` + `sortWithinPartitions` +
  * parquet, and the scan side prunes row groups from footer stats for
  * free.
  *
  * The load-bearing detail is NORMALIZATION: naive interleave of raw
  * values lets the dimension with the larger numeric range own all
  * the significant bits, and the "z" order degenerates to a
  * single-column sort (measured here: raw interleave of an 8-bit user
  * domain with a wider hour domain was WORSE than sorting by user
  * alone). So each dimension is first scaled to the key's full
  * [[ZBits]]-bit range from a one-row min/max stats pass — exactly
  * the range-id pass production z-ordering runs at write time. The
  * stats row rides a broadcast (fixed-size by construction); the key
  * itself is then row-local integer arithmetic, identical on both
  * engines, so the whole computation carries a full oracle. The
  * clustering EFFECT (per-partition bounding boxes shrink on both
  * dimensions vs any single-column layout) is spec-measured, since
  * file assignment is not an engine-portable artifact.
  */
object LayoutOps {

  /** Bits interleaved per dimension (z-value spans 2×[[ZBits]] bits). */
  val ZBits = 16

  private val ZRange = 1 << ZBits

  /** Morton interleave of the low [[ZBits]] bits of two long
    * expressions: dimension `a` on even bit positions, `b` on odd.
    * Expanded to a flat +-chain of shift/mask terms — stays inside
    * whole-stage codegen, no lambda. Callers MUST pass bound column
    * names (each arg is substituted [[ZBits]] times).
    */
  private[graft] def zExpr(a: String, b: String): String =
    (0 until ZBits).map(j =>
      s"shiftleft(shiftright($a, $j) & 1, ${2 * j}) + " +
        s"shiftleft(shiftright($b, $j) & 1, ${2 * j + 1})")
      .mkString("(", " + ", ")")

  private def zDuck(a: String, b: String): String =
    (0 until ZBits).map(j =>
      s"((($a >> $j) & 1) << ${2 * j}) + ((($b >> $j) & 1) << ${2 * j + 1})")
      .mkString("(", " + ", ")")

  /** The two clustering dimensions of the events layout: user and
    * hour bucket (row-local).
    */
  private[graft] val UserDim = s"(user_id & ${ZRange - 1})"
  private[graft] val HourDim = s"((ts_ms div 3600000) & ${ZRange - 1})"

  /** (event_id, u, h, a, b, z): raw dims, dims normalized to the full
    * [[ZBits]]-bit range via the broadcast one-row min/max stats, and
    * the Morton key. Shared by the gate entry and the layout path so
    * the oracled key IS the key the layout sorts by.
    */
  private[graft] def zKeyed(events: DataFrame): DataFrame = {
    val e = events.select(col("event_id"),
      expr(UserDim).as("u"), expr(HourDim).as("h"))
    val stats = e.agg(
      min("u").as("ulo"), max("u").as("uhi"),
      min("h").as("hlo"), max("h").as("hhi"))
    e.crossJoin(broadcast(stats))
      .withColumn("a", expr(s"((u - ulo) * $ZRange) div (uhi - ulo + 1)"))
      .withColumn("b", expr(s"((h - hlo) * $ZRange) div (hhi - hlo + 1)"))
      .select(col("event_id"), col("u"), col("h"), col("a"), col("b"),
        expr(zExpr("a", "b")).cast(LongType).as("z"))
  }

  /** Gate entry: the normalized Morton key for every event — the
    * deterministic core the write path sorts by.
    */
  def optZorder(spark: SparkSession, dir: String): DataFrame =
    zKeyed(Tables.events(spark, dir))
      .select("event_id", "z")
      .orderBy("event_id")

  def optZorderSql: String =
    s"""WITH e AS (
       |  SELECT event_id, (user_id & ${ZRange - 1}) AS u,
       |    ((epoch_ms(ts) // 3600000) & ${ZRange - 1}) AS h
       |  FROM events),
       |st AS (SELECT MIN(u) AS ulo, MAX(u) AS uhi, MIN(h) AS hlo, MAX(h) AS hhi FROM e),
       |n AS (
       |  SELECT event_id,
       |    ((u - ulo) * $ZRange) // (uhi - ulo + 1) AS a,
       |    ((h - hlo) * $ZRange) // (hhi - hlo + 1) AS b
       |  FROM e, st)
       |SELECT event_id, CAST(${zDuck("a", "b")} AS BIGINT) AS z
       |FROM n ORDER BY event_id""".stripMargin

  /** The write-side layout plan the key exists for — exposed for the
    * clustering-effect spec: range-partition + sort by `layoutCol`
    * over the keyed projection.
    */
  private[graft] def layoutBy(events: DataFrame, layoutCol: String,
      partitions: Int): DataFrame =
    zKeyed(events)
      .repartitionByRange(partitions, col(layoutCol))
      .sortWithinPartitions(layoutCol)

  /** One-pass-per-column EXACT table statistics — the ANALYZE-style
    * stats pass a cost-based layer feeds on (row count, null count,
    * NDV, min/max per column). The load-bearing plan decision is how
    * NDV is computed: asking for several `COUNT(DISTINCT c)` in ONE
    * aggregate makes Catalyst plan an Expand that replays every input
    * row once PER DISTINCT AGGREGATE (k columns → k× the scan's rows
    * through the first shuffle — a scale-killer on a fact table).
    * Instead each column gets its own branch: `groupBy(c).count()`
    * collapses to DISTINCT VALUES at the map side (partial agg), so
    * the shuffle carries only the value domain, and the second
    * aggregate over that tiny frame reads off ndv/min/max/null-count
    * together. Each branch's parquet scan is column-pruned to exactly
    * its one column (spec-pinned), so the union of k branches reads
    * each column once — the same total I/O as one k-column scan, with
    * no Expand anywhere. Approximate one-scan NDV for when even the
    * domain shuffle is too much lives in sketch_hll; this operator is
    * the exact arm.
    */
  def optTableStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // (name, value-expression rendered as bigint?, is-numeric)
    def branch(name: String, asNum: Boolean): DataFrame = {
      val v = if (asNum) col(name).cast(LongType) else col(name)
      val g = li.select(v.as("v")).groupBy("v")
        .agg(count(lit(1)).cast(LongType).as("cnt"))
      val nulls = when(col("v").isNotNull, col("cnt"))
      g.agg(
        coalesce(sum(col("cnt")), lit(0L)).cast(LongType).as("n_rows"),
        coalesce(sum(nulls), lit(0L)).cast(LongType).as("n_nonnull"),
        count(when(col("v").isNotNull, lit(1))).cast(LongType).as("ndv"),
        (if (asNum) min(col("v")).cast(LongType)
         else lit(null).cast(LongType)).as("min_num"),
        (if (asNum) max(col("v")).cast(LongType)
         else lit(null).cast(LongType)).as("max_num"),
        (if (asNum) lit(null).cast("string")
         else min(col("v")).cast("string")).as("min_str"),
        (if (asNum) lit(null).cast("string")
         else max(col("v")).cast("string")).as("max_str"))
        .select(lit(name).as("column_name"), col("n_rows"), col("n_nonnull"),
          (col("n_rows") - col("n_nonnull")).as("n_null"), col("ndv"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }
    branch("l_orderkey", asNum = true)
      .unionAll(branch("l_partkey", asNum = true))
      .unionAll(branch("l_quantity", asNum = true))
      .unionAll(branch("l_returnflag", asNum = false))
      .orderBy("column_name")
  }

  def optTableStatsSql: String = {
    def num(name: String) =
      s"""SELECT '$name' AS column_name,
         |  COUNT(*) AS n_rows, COUNT($name) AS n_nonnull,
         |  COUNT(*) - COUNT($name) AS n_null,
         |  COUNT(DISTINCT CAST($name AS BIGINT)) AS ndv,
         |  CAST(MIN($name) AS BIGINT) AS min_num,
         |  CAST(MAX($name) AS BIGINT) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM lineitem""".stripMargin
    def str(name: String) =
      s"""SELECT '$name' AS column_name,
         |  COUNT(*) AS n_rows, COUNT($name) AS n_nonnull,
         |  COUNT(*) - COUNT($name) AS n_null,
         |  COUNT(DISTINCT $name) AS ndv,
         |  CAST(NULL AS BIGINT) AS min_num, CAST(NULL AS BIGINT) AS max_num,
         |  MIN($name) AS min_str, MAX($name) AS max_str
         |FROM lineitem""".stripMargin
    Seq(num("l_orderkey"), num("l_partkey"), num("l_quantity"),
      str("l_returnflag")).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "opt_zorder" -> (optZorder _),
    "opt_table_stats" -> (optTableStats _))

  def oracles: Map[String, String] = Map(
    "opt_zorder" -> optZorderSql,
    "opt_table_stats" -> optTableStatsSql)
}
