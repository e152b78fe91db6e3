package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Batch analytics headliners (SURVEY.md §2 "Analytics core").
  *
  * Scale posture: every query is a declarative DataFrame plan — filters
  * and projections reach the parquet scan, aggregates get map-side
  * partial combine. `broadcast()` hints are reserved for FIXED-SIZE
  * dims (nation=25, region=5 rows at every SF); any side that scales
  * with the corpus (customer, supplier, …) is left unhinted so AQE
  * picks broadcast at small SF and a shuffled join at 100 TB.
  */
object Analytics {

  /** TPC-H Q1 shape: scan + filter + 8-way aggregate.
    * One shuffle (groupBy), decimal math for an exact oracle.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).as("_sq"),
        sum(dec2(col("l_extendedprice"))).as("_sbp"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))).as("_sdp"),
        sum(dec2(col("l_discount"))).as("_sd"),
        count(lit(1)).cast(LongType).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        moneyStr(col("_sq")).as("sum_qty"),
        moneyStr(col("_sbp")).as("sum_base_price"),
        money4Str(col("_sdp")).as("sum_disc_price"),
        // exact avg at 1e-4 precision: floor(sum*10^4 / n) in integer
        // space — DuckDB AVG(DECIMAL) detours through DOUBLE, this
        // doesn't.
        expr("CAST(CAST(_sq * 10000 AS BIGINT) DIV count_order AS BIGINT)").as("avg_qty_e4"),
        expr("CAST(CAST(_sd * 10000 AS BIGINT) DIV count_order AS BIGINT)").as("avg_disc_e4"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 10000 AS BIGINT) // COUNT(*) AS avg_qty_e4,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) // COUNT(*) AS avg_disc_e4,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, agg, top-10.
    * customer SCALES with the corpus (150k rows × SF), so its join
    * strategy is left to AQE: at test SF the runtime stats pick a
    * broadcast, at 100 TB the same plan degrades gracefully to a
    * shuffled join instead of a driver OOM. orders⋈lineitem shuffles
    * on orderkey once and the groupBy reuses that partitioning.
    */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1995-03-15"))
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1995-03-15"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(money4Str(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))).as("revenue"))
      .select(
        col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").cast("decimal(38,4)").desc, col("l_orderkey"))
      .limit(10)
  }

  def q3ShippingSql: String =
    """SELECT l_orderkey,
      |  STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  o_orderpriority,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: 5-way star join. nation and region are FIXED-SIZE
    * dims (25 / 5 rows at every SF) and stay force-broadcast; customer
    * and supplier scale with the corpus, so their strategies are
    * AQE-decided — broadcast at test SF, shuffled join at 100 TB.
    */
  def q5Regional(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val s = Tables.supplier(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(money4Str(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))).as("revenue"))
      .orderBy(col("n_name"))
  }

  def q5RegionalSql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** TPC-H Q7 shape: nation-pair shipping volume by year. Six-way
    * join where BOTH nation arms are the same fixed-size dim (25 rows
    * at every SF) — each side is pre-filtered to the two-nation set
    * (pushes to its broadcast build) and the cross-table pair
    * disjunction applies post-join, the only place it can. customer /
    * supplier stay AQE-decided; lineitem⋈orders shuffles on orderkey
    * once.
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val n1 = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
    l.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(
        (col("supp_nation") === pair.head && col("cust_nation") === pair(1)) ||
          (col("supp_nation") === pair(1) && col("cust_nation") === pair.head))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(money4Str(sum(dec2(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  def q7VolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q9 shape: profit by supplier nation and order year for one
    * part segment (retail cost share stands in for ps_supplycost — the
    * corpus has no partsupp table). Decimal factors are kept at
    * (12,2)/(8,2) so the triple product's scale-6 precision stays
    * under 38 in BOTH engines (no rounding divergence). part is
    * filter-pruned at the scan (p_type pushdown) but SCALES with the
    * corpus, so its join stays AQE-decided like customer/supplier;
    * only nation is force-broadcast.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    def d12(c: Column): Column = c.cast("decimal(12,2)")
    val p = Tables.part(spark, dir).filter(col("p_type") === "PROMO")
    val l = Tables.lineitem(spark, dir)
    l.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(money6Str(sum(
        d12(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - d12(col("l_discount"))) -
          d12(col("p_retailprice")) * d12(col("l_quantity")) * lit("0.06").cast("decimal(8,2)")))
        .as("profit"))
      .orderBy("nation", "o_year")
  }

  def q9ProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
      |      - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.06 AS DECIMAL(8,2))) AS DECIMAL(38,6)) AS VARCHAR) AS profit
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_type = 'PROMO'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** TPC-H Q18 shape: aggregate → filter → join back. The HAVING-style
    * quantity gate runs FIRST (one groupBy on orderkey), shrinking the
    * probe side before any join; the join back to orders is on the
    * SAME key the aggregate just partitioned by, so the exchange is
    * reused, and the big-order key set scales with the corpus —
    * AQE-decided, never hinted.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).as("_q"))
      .filter(col("_q") > lit(150).cast("decimal(18,2)"))
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        moneyStr(col("_q")).as("sum_qty"))
      .orderBy("o_orderkey")
  }

  def q18LargeOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
      |  FROM lineitem GROUP BY 1
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
      |SELECT c_custkey, o_orderkey,
      |  STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(CAST(q AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty
      |FROM big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** TPC-H Q4 shape: order-priority checking — a date-windowed scan
    * semi-joined against flagged line items (EXISTS), then a tiny
    * count-by-priority. The semi join keeps only probe-side rows (no
    * payload from lineitem crosses the shuffle), the date filter
    * pushes to the orders scan, and the returnflag filter pushes to
    * the lineitem scan — both sides arrive pre-shrunk.
    */
  def q4Priority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val flagged = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    o.join(flagged, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast(LongType).as("order_count"))
      .orderBy("o_orderpriority")
  }

  def q4PrioritySql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q13 shape: customer order-count DISTRIBUTION — the outer
    * join + double aggregation that stresses what Q4's semi join
    * doesn't: customers with NO orders must survive with c_count = 0,
    * so the exclusion filter rides the JOIN CONDITION (a WHERE after a
    * left-outer join would silently delete the zero-order customers —
    * the classic Q13 trap). Scale posture: both sides shuffle once on
    * the customer key; the per-customer count reuses that exchange's
    * partitioning; the second aggregation runs over the tiny c_count
    * histogram domain. `count(o_orderkey)` skips the nulls the outer
    * join produces, which IS the zero-orders encoding.
    */
  def q13Custdist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderpriority")
    c.join(o,
      col("c_custkey") === col("o_custkey") &&
        col("o_orderpriority") =!= "1-URGENT",
      "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).cast(LongType).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  def q13CustdistSql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c LEFT OUTER JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q11 shape: groups whose share of a GLOBAL aggregate clears
    * a threshold — HAVING against an uncorrelated scalar subquery over
    * the same table. Unlike the correlated form (q_corr_subquery),
    * this plans as ONE extra tiny aggregation whose single-row result
    * is inlined into the filter: no join, no per-group re-scan. The
    * threshold is SCALE-FREE — customers above 1.5× the MEAN customer
    * spend (a fixed fraction-of-total cutoff goes vacuous as the
    * customer count grows) — compared by integer cross-multiplication
    * (spend × 2 × customers > 3 × total): no division, no floats, and
    * both global aggregates ride one struct-valued subquery (a single
    * extra scan).
    */
  def q11Share(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_q11")
    spark.sql(
      """SELECT o_custkey, spend_e2 FROM (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS spend_e2,
        |    (SELECT named_struct(
        |       't', CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT),
        |       'c', CAST(COUNT(DISTINCT o_custkey) AS BIGINT))
        |     FROM orders_q11) AS agg
        |  FROM orders_q11
        |  GROUP BY o_custkey) g
        |WHERE spend_e2 * 2 * agg.c > 3 * agg.t
        |ORDER BY spend_e2 DESC, o_custkey""".stripMargin)
      .select("o_custkey", "spend_e2")
  }

  def q11ShareSql: String =
    """SELECT o_custkey, spend_e2 FROM (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS spend_e2,
      |    (SELECT struct_pack(
      |       t := CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT),
      |       c := CAST(COUNT(DISTINCT o_custkey) AS BIGINT))
      |     FROM orders) AS agg
      |  FROM orders
      |  GROUP BY o_custkey) g
      |WHERE spend_e2 * 2 * agg.c > 3 * agg.t
      |ORDER BY spend_e2 DESC, o_custkey""".stripMargin

  /** Pivot (long → wide): per-user spend by event type. The pivot
    * value list is EXPLICIT — the closed event-type vocabulary — so no
    * distinct-values job runs on the driver and the output schema is
    * static at any corpus size (a dynamic pivot would collect the
    * distinct set to the driver: fine for 5 types, a bug for an
    * unbounded column). One shuffle; the pivot aggregates fold
    * map-side like any groupBy.
    */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def qPivot(spark: SparkSession, dir: String): DataFrame =
    qPivotOf(Tables.events(spark, dir))

  /** Pivot over an externally supplied events-shaped frame — the
    * missing-cell spec feeds a synthetic corpus through it (every
    * corpus SF happens to fill all user×type cells, so the zero-fill
    * path is pinned synthetically).
    */
  def qPivotOf(events: DataFrame): DataFrame = {
    val zero = lit(0).cast("decimal(18,2)")
    events
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(sum(dec2(col("value"))))
      .select(col("user_id") +:
        EventTypes.map(t => moneyStr(coalesce(col(t), zero)).as(t)): _*)
      .orderBy("user_id")
  }

  def qPivotSql: String = {
    val cols = EventTypes.map(t =>
      s"  CAST(CAST(COALESCE(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END), CAST(0 AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS $t")
      .mkString(",\n")
    s"""SELECT user_id,
       |$cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** Explicit GROUPING SETS — the general form ROLLUP/CUBE are sugar
    * for: the two single-dimension marginals WITHOUT the combined or
    * grand-total sets (a shape neither rollup nor cube can express).
    * Spark expands the sets map-side like rollup (still one shuffle);
    * `grouping()` markers distinguish "aggregated-away" from a data
    * NULL, so the oracle compare never leans on the ALL placeholder.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    // pre-aggregate to the finest grouping below the Expand — see
    // qRollup (same r18 plan-audit rewrite); the finest grouping for
    // sets {(status), (priority)} is (status, priority)
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(dec2(col("o_totalprice"))).as("price0"),
        count(lit(1)).as("n0"))
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast(LongType).as("g_status"),
        grouping(col("o_orderpriority")).cast(LongType).as("g_priority"),
        sum(col("n0")).cast(LongType).as("n"),
        moneyStr(sum(col("price0"))).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_status"), col("g_priority"), col("n"), col("sum_price"))
      .orderBy("status", "priority")

  def qGroupingSetsSql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY status, priority""".stripMargin

  /** Correlated scalar subquery through the SQL surface: customers
    * whose balance beats their nation's average. Written as the
    * correlated form on purpose — Catalyst DECORRELATES it
    * (RewriteCorrelatedScalarSubquery) into one per-nation aggregate
    * plus a join on the correlation key, so the executed plan is the
    * scalable two-pass shape, not a per-row re-scan. "Beats the
    * average" is compared by CROSS-MULTIPLICATION in ×1e4 integer
    * space (`bal_e4 * count > sum_e4`): no division at all, so there
    * is no floor-vs-truncate divergence between engines — Spark's
    * `div` truncates toward zero while other engines' integer
    * division floors, which disagree exactly when a nation's balance
    * sum is negative (AnalyticsSpec pins that case with a synthesized
    * corpus). Both aggregates ride ONE struct-valued scalar subquery
    * so the decorrelated plan builds a single per-nation aggregate +
    * join — two separate subqueries planned two aggregates and a
    * third scan.
    */
  def qCorrSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_qcs")
    spark.sql(
      """SELECT c_custkey, nationkey, bal_e4 FROM (
        |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 10000 AS BIGINT) AS bal_e4,
        |    (SELECT named_struct(
        |       's', CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 10000 AS BIGINT),
        |       'c', COUNT(*))
        |     FROM customer_qcs c2 WHERE c2.c_nationkey = c.c_nationkey) AS agg
        |  FROM customer_qcs c) t
        |WHERE bal_e4 * agg.c > agg.s
        |ORDER BY c_custkey""".stripMargin)
      .select("c_custkey", "nationkey", "bal_e4")
  }

  def qCorrSubquerySql: String =
    """SELECT c_custkey, nationkey, bal_e4 FROM (
      |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 10000 AS BIGINT) AS bal_e4,
      |    (SELECT struct_pack(
      |       s := CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 10000 AS BIGINT),
      |       c := COUNT(*))
      |     FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey) AS agg
      |  FROM customer c) t
      |WHERE bal_e4 * agg.c > agg.s
      |ORDER BY c_custkey""".stripMargin

  /** LATERAL correlated subquery: each nation's top-balance customer —
    * the per-row-subquery surface (ANSI LATERAL) next to
    * [[qCorrSubquery]]'s scalar form. Catalyst decorrelates the
    * correlated ORDER BY … LIMIT 1 into a per-nation window/aggregate
    * + join, so the executed plan never re-scans customer per nation
    * row. Balances compare in floor(×1e4) integer space like the
    * scalar-subquery query.
    */
  def qLateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("nation_ql")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_ql")
    spark.sql(
      """SELECT n_name, c_custkey, bal_e4
        |FROM nation_ql n,
        |LATERAL (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 10000 AS BIGINT) AS bal_e4
        |  FROM customer_ql
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
        |  LIMIT 1) t
        |ORDER BY n_name""".stripMargin)
  }

  def qLateralSql: String =
    """SELECT n_name, c_custkey, bal_e4
      |FROM nation n,
      |LATERAL (
      |  SELECT c_custkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 10000 AS BIGINT) AS bal_e4
      |  FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
      |  LIMIT 1) t
      |ORDER BY n_name""".stripMargin

  /** [[Salting.saltedAgg]] under the oracle gate: the two-phase salted
    * aggregation over the events table's 5-value event_type key — a
    * genuinely skewed key (~n/5 rows per group at any SF, far past
    * what one reducer should hold). The salt spreads each group over
    * 16 partial reducers; the final pass merges 5×16 partial rows.
    * Result is row-identical to the direct groupBy the oracle runs —
    * THE salting contract, previously asserted only by spec.
    */
  def qSaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Salting.saltedAgg(Tables.events(spark, dir), "event_type",
      col("event_id"), salts = 16)(
      partialAgg = Seq(
        count(lit(1)).as("_n"),
        sum(dec2(col("value"))).as("_sv")),
      finalAgg = Seq(
        sum(col("_n")).cast(LongType).as("n_events"),
        moneyStr(sum(col("_sv"))).as("sum_value")))
      .orderBy("event_type")

  def qSaltedAggSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Salted skewed equi-join (SURVEY §2 `skew_salting`, gate-promoted
    * r17 — spec-only since r9): events ⋈ customer on user_id through
    * [[Salting.saltedJoin]]. The corpus is genuinely skewed for this
    * key — every event lands on the first 10% of customer keys (sf0.01:
    * 10k events over custkeys 0-149 of 1500) — so the unsalted join
    * funnels all probe work through 150 reducer keys while the salted
    * plan spreads each hot key over 8 salt reducers. The oracle is the
    * PLAIN unsalted join: salting must be row-identical (the aggregate
    * totals would shift on any dropped/duplicated pair), which is
    * exactly the contract SaltingSpec pins structurally.
    */
  def skewSalting(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    Salting.saltedJoin(Tables.events(spark, dir), cust, "user_id",
        discriminator = col("event_id"), salts = 8)
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).cast(LongType).as("n_events"),
        moneyStr(sum(dec2(col("value")))).as("sum_value"))
      .orderBy("c_mktsegment", "event_type")
  }

  def skewSaltingSql: String =
    """SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Set operators over key sets: engaged users = clickers ∩
    * purchasers, minus anyone with a HIGH-SEVERITY error (value > 90 —
    * a plain "ever errored" arm is vacuous on this corpus, where every
    * user carries every event type) — INTERSECT and EXCEPT composed.
    * Spark plans both as LEFT-SEMI / LEFT-ANTI joins over
    * pre-distincted sides (set semantics, not bag): each side prunes
    * to one column at the scan, so what shuffles is three key sets,
    * never event payloads.
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    def users(t: String) = Tables.events(spark, dir)
      .filter(col("event_type") === t).select("user_id")
    val severe = Tables.events(spark, dir)
      .filter(col("event_type") === "error" && col("value") > 90)
      .select("user_id")
    users("click").intersect(users("purchase"))
      .except(severe)
      .orderBy("user_id")
  }

  def qSetOpsSql: String =
    """(SELECT user_id FROM events WHERE event_type = 'click'
      | INTERSECT
      | SELECT user_id FROM events WHERE event_type = 'purchase')
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'error' AND value > 90
      |ORDER BY user_id""".stripMargin

  /** Time-RANGE window frame: each event's trailing one-hour per-user
    * spend — a moving aggregate whose frame is an event-time INTERVAL,
    * not a row count (rows-frames answer "last N events"; ops
    * monitoring asks "the last hour", however many events that is).
    * One window shuffle on user_id; the range frame runs on the
    * epoch-millis ordering both engines share.
    */
  def qMovingWindow(spark: SparkSession, dir: String): DataFrame = {
    val hourMs = 3600000L
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"))
      .rangeBetween(-hourMs, 0)
    // materialize-once before the presentation sort (r18 plan audit:
    // the sort's sample pass re-ran the window pass from the shuffle)
    graft.Scratch.cpSorted(Tables.events(spark, dir)
      .withColumn("hour_value", moneyStr(sum(dec2(col("value"))).over(w)))
      .withColumn("hour_events", count(lit(1)).over(w).cast(LongType))
      .select(col("user_id"), col("event_id"), col("hour_value"), col("hour_events")),
      col("user_id"), col("event_id"))
  }

  def qMovingWindowSql: String =
    """SELECT user_id, event_id,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(38,2)) AS VARCHAR) AS hour_value,
      |  COUNT(*) OVER w AS hour_events
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** Per-user top-3 events by value: one window shuffle on user_id. */
  def qWindowTopN(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    // materialize-once before the presentation sort (r18 plan audit)
    graft.Scratch.cpSorted(e.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("user_id"), col("rnk"), col("event_id"), col("event_type")),
      col("user_id"), col("rnk"))
  }

  def qWindowTopNSql: String =
    """SELECT user_id, rnk, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
      |  FROM events) t
      |WHERE rnk <= 3
      |ORDER BY user_id, rnk""".stripMargin

  /** Gap-based sessionization: a session breaks after >30 min idle.
    * lag + conditional cumulative sum — two window passes over ONE
    * shuffle (same partitioning user_id, same ordering).
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val gapMs = 30L * 60 * 1000
    // materialize-once before the presentation sort (r18 plan audit)
    graft.Scratch.cpSorted(
      e.withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("new_sess")).over(byUser))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(
          count(lit(1)).cast(LongType).as("n_events"),
          min(col("ts_ms")).as("start_ms"),
          max(col("ts_ms")).as("end_ms")),
      col("user_id"), col("session_seq"))
  }

  def qSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |    LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_id, ms,
      |    CAST(SUM(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ms, event_id) AS BIGINT) AS session_seq
      |  FROM g)
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  MIN(ms) AS start_ms, MAX(ms) AS end_ms
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** Running total per user over time: range-unbounded window. */
  def qRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    // materialize-once before the presentation sort (r18 plan audit)
    graft.Scratch.cpSorted(
      e.withColumn("running_value", moneyStr(sum(dec2(col("value"))).over(w)))
        .select(col("user_id"), col("event_id"), col("running_value")),
      col("user_id"), col("event_id"))
  }

  def qRunningTotalSql: String =
    """SELECT user_id, event_id,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS DECIMAL(38,2)) AS VARCHAR) AS running_value
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  /** Multi-dimensional aggregate: ROLLUP over (returnflag, linestatus)
    * — subtotals + grand total in one pass (partial aggs expand the
    * grouping sets map-side; still ONE shuffle).
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    // pre-aggregate to the FINEST grouping before the rollup: Expand
    // otherwise replicates every input row once per grouping set
    // (3x the full lineitem flow through the partial aggregate — the
    // r18 plan audit's finding); over the pre-aggregated frame the
    // Expand touches only |distinct (rflag, lstatus)| rows. Decimal
    // sums re-aggregate exactly (addition is associative; moneyStr
    // renders both forms at DECIMAL(38,2)), counts re-sum.
    val fine = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec2(col("l_quantity"))).as("qty0"),
        count(lit(1)).as("n0"))
    fine.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(moneyStr(sum(col("qty0"))).as("sum_qty"),
        sum(col("n0")).cast(LongType).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("sum_qty"), col("n"))
      .orderBy("rflag", "lstatus")
  }

  def qRollupSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
      |  COALESCE(l_linestatus, 'ALL') AS lstatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rflag, lstatus""".stripMargin

  /** CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    * pass — the full grouping-set machinery next to ROLLUP's
    * hierarchy.
    */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    // pre-aggregate to the finest grouping below the Expand — see
    // qRollup (same r18 plan-audit rewrite)
    val fine = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n0"))
    fine.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("n0")).cast(LongType).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("n"))
      .orderBy("rflag", "lstatus")
  }

  def qCubeSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
      |  COALESCE(l_linestatus, 'ALL') AS lstatus,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY rflag, lstatus""".stripMargin

  /** Semi-join: orders having at least one returned line item —
    * `left_semi` keeps the probe side only (no row multiplication, no
    * payload columns shuffled from the build side).
    */
  def qSemiReturned(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  def qSemiReturnedSql: String =
    """SELECT o_orderkey, o_orderpriority FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |ORDER BY o_orderkey""".stripMargin

  /** Anti-join: customers gone idle (no order since 1998) —
    * `left_anti` against the filtered key set; the filter pushes to
    * the orders scan so the anti side stays small.
    */
  def qAntiIdle(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01")).select("o_custkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  def qAntiIdleSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** Exact distinct counting per group — Spark plans this as a
    * two-phase expand + partial agg (the distinct shuffles on
    * (event_type, user_id) first, then counts), which is the
    * scalable shape; `Salting.saltedAgg` is the fallback for a
    * pathological single hot group.
    */
  def qDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).cast(LongType).as("n_events"))
      .orderBy("event_type")

  def qDistinctUsersSql: String =
    """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Exact per-group percentiles, positionally (the element at
    * floor((n-1)·p), "lower" interpolation) — engine quantile
    * functions disagree on interpolation, the positional form is
    * deterministic everywhere and one window pass computes any number
    * of cut points.
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val ranked = e
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    // materialize-once before the presentation sort (r18 plan audit:
    // the sort's sample pass re-ran both window passes + the agg)
    graft.Scratch.cpSorted(ranked.groupBy("event_type")
      .agg(
        moneyStr(max(when(col("rn") === expr("CAST(FLOOR((n - 1) * 0.5) AS BIGINT) + 1"), dec2(col("value"))))).as("p50"),
        moneyStr(max(when(col("rn") === expr("CAST(FLOOR((n - 1) * 0.95) AS BIGINT) + 1"), dec2(col("value"))))).as("p95"),
        max(col("n")).as("n")),
      col("event_type"))
  }

  def qPercentilesSql: String =
    """WITH r AS (
      |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type,
      |  CAST(CAST(MAX(CASE WHEN rn = CAST(FLOOR((n - 1) * 0.5) AS BIGINT) + 1 THEN v END) AS DECIMAL(38,2)) AS VARCHAR) AS p50,
      |  CAST(CAST(MAX(CASE WHEN rn = CAST(FLOOR((n - 1) * 0.95) AS BIGINT) + 1 THEN v END) AS DECIMAL(38,2)) AS VARCHAR) AS p95,
      |  MAX(n) AS n
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Window-function breadth on ONE shuffle: ntile quartiles, lead
    * (next event's value), cume_dist and percent_rank over the same
    * (user_id, ordered) window — Spark plans all four in a single
    * Window operator over one hashpartitioning(user_id) exchange.
    * The rank-fraction functions are rationals (rank/n) — rendered
    * fixed-point e6 with floor so the oracle compares integers, never
    * doubles.
    */
  def qWindowFuncs(spark: SparkSession, dir: String): DataFrame =
    // materialize-once before the presentation sort (r18 plan audit)
    graft.Scratch.cpSorted(qWindowFuncsScored(spark, dir),
      col("user_id"), col("event_id"))

  /** The window frame BEFORE the seal — the one-Window/one-shuffle
    * plan contract is asserted here (sealing checkpoints the result,
    * hiding the Window operator from the consumer's plan).
    */
  private[graft] def qWindowFuncsScored(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    e.select(
      col("user_id"), col("event_id"),
      ntile(4).over(w).cast(LongType).as("quartile"),
      coalesce(moneyStr(dec2(lead(col("value"), 1).over(w))), lit("")).as("next_value"),
      floor(cume_dist().over(w) * 1000000).cast(LongType).as("cume_e6"),
      floor(percent_rank().over(w) * 1000000).cast(LongType).as("prank_e6"))
  }

  def qWindowFuncsSql: String =
    """SELECT user_id, event_id,
      |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |  COALESCE(CAST(CAST(CAST(LEAD(value, 1) OVER w AS DECIMAL(18,2)) AS DECIMAL(38,2)) AS VARCHAR), '') AS next_value,
      |  CAST(FLOOR(CUME_DIST() OVER w * 1000000) AS BIGINT) AS cume_e6,
      |  CAST(FLOOR(PERCENT_RANK() OVER w * 1000000) AS BIGINT) AS prank_e6
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** TPC-H Q6 shape: the pure scan-side query — one table, three
    * range predicates, one global sum. Every predicate reaches the
    * parquet scan (`PushedFilters` carries shipdate, quantity; the
    * discount band compares on the 2-decimal cast), so at 100 TB this
    * reads only row groups whose stats overlap the year and ships ONE
    * row to the driver: the query whole-stage-codegens to scan +
    * partial sum + single-row final sum, no shuffle of data rows.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        dec2(col("l_discount")).between(lit("0.02").cast("decimal(18,2)"),
          lit("0.04").cast("decimal(18,2)")) &&
        col("l_quantity") < 24)
      .agg(money4Str(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount"))))
        .as("revenue"))

  def q6ForecastSql: String =
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                      CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS VARCHAR) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.02 AND 0.04
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q10 shape: returned-item revenue top-20 — a quarter of
    * orders joined to its R-flagged line items, revenue per customer,
    * nation name from the broadcast dim. The date filter pushes to the
    * orders scan and the returnflag filter to the lineitem scan BEFORE
    * the orderkey shuffle; the top-20 runs as TakeOrderedAndProject
    * (per-partition top-20, tiny driver merge), never a global sort.
    * The tie-break (revenue, custkey) makes the LIMIT cut
    * deterministic in both engines.
    */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01") &&
        col("o_orderdate") < lit("1996-10-01"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (dec2(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))).as("_rev"))
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("_rev")).as("_r"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        money4Str(col("_r")).as("revenue"), col("_r"))
      .orderBy(col("_r").desc, col("c_custkey"))
      .limit(20)
      .drop("_r")
  }

  def q10ReturnsSql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(CAST(rev AS DECIMAL(38,4)) AS VARCHAR) AS revenue
      |FROM (
      |  SELECT o_custkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |    AND l_returnflag = 'R'
      |  GROUP BY o_custkey) t
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY rev DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q14 shape: promo revenue SHARE in a month — a two-branch
    * conditional aggregate over lineitem ⋈ part. The share is rendered
    * at fixed e4 precision by INTEGER arithmetic (both sums scaled to
    * integer cents-of-cents, then bigint floor-divide): no decimal
    * division whose precision rules differ between engines, no
    * doubles. The month filter pushes to the lineitem scan; part joins
    * on partkey (AQE broadcasts the dim at small SF).
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-03-01") &&
        col("l_shipdate") < lit("1997-04-01"))
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO",
          dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .otherwise(lit(0).cast("decimal(18,4)"))).as("_promo"),
        sum(dec2(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))).as("_total"))
      .select(
        expr("CAST(CAST(_promo * 10000 AS BIGINT) * 10000 DIV CAST(_total * 10000 AS BIGINT) AS BIGINT)")
          .as("promo_share_e4"),
        money4Str(col("_promo")).as("promo_revenue"),
        money4Str(col("_total")).as("total_revenue"))
  }

  def q14PromoSql: String =
    """SELECT
      |  CAST(promo * 10000 AS BIGINT) * 10000 // CAST(total * 10000 AS BIGINT) AS promo_share_e4,
      |  CAST(CAST(promo AS DECIMAL(38,4)) AS VARCHAR) AS promo_revenue,
      |  CAST(CAST(total AS DECIMAL(38,4)) AS VARCHAR) AS total_revenue
      |FROM (
      |  SELECT
      |    SUM(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS promo,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00') t""".stripMargin

  /** TPC-H Q17 shape: small-quantity orders for one brand — the
    * correlated "below 20% of this part's average quantity" filter,
    * decorrelated into a per-part aggregate joined back. Division-free
    * correlation: qty < 0.2 × (sum/cnt) becomes qty × 5 × cnt < sum by
    * integer cross-multiplication, exact in decimal space. The brand
    * filter shrinks part BEFORE the join (broadcast at small SF); the
    * per-part stats reuse the matched join's partkey partitioning.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#13").select("p_partkey")
    val matched = Tables.lineitem(spark, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), dec2(col("l_quantity")).as("_q"),
        dec2(col("l_extendedprice")).as("_e"))
    val stats = matched.groupBy(col("l_partkey").as("_sk"))
      .agg(sum(col("_q")).as("_sq"), count(lit(1)).as("_cnt"))
    matched.join(stats, col("l_partkey") === col("_sk"))
      .filter(col("_q") * lit(5) * col("_cnt") < col("_sq"))
      .agg(moneyStr(sum(col("_e"))).as("small_qty_revenue"),
        count(lit(1)).cast(LongType).as("n_lines"))
  }

  def q17SmallQtySql: String =
    """WITH m AS (
      |  SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,2)) AS q,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) AS e
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#13'),
      |s AS (SELECT l_partkey AS sk, SUM(q) AS sq, COUNT(*) AS cnt
      |      FROM m GROUP BY 1)
      |SELECT CAST(CAST(SUM(e) AS DECIMAL(38,2)) AS VARCHAR) AS small_qty_revenue,
      |       COUNT(*) AS n_lines
      |FROM m JOIN s ON l_partkey = sk
      |WHERE q * 5 * cnt < sq""".stripMargin

  /** TPC-H Q19 shape: DISJUNCTIVE join predicates — three
    * brand × quantity-band arms OR-ed together after the partkey
    * equi-join. Catalyst extracts the common equi-key (the join stays
    * a hash join, never a cartesian) and pushes the per-side conjunct
    * unions down to both scans; the OR evaluates post-join on the
    * matched pairs only.
    */
  def q19Discount(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#13" && col("l_quantity").between(20, 30)))
      .agg(money4Str(sum(dec2(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))).as("revenue"),
        count(lit(1)).cast(LongType).as("n_lines"))
  }

  def q19DiscountSql: String =
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS revenue,
      |       COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q22 shape: rich prospects who never ordered — an
    * uncorrelated scalar threshold (above the positive-balance mean)
    * plus an ANTI join against orders, grouped by nation. The mean
    * compare is division-free (bal × cnt⁺ > sum⁺ in decimal space);
    * the anti join ships only custkeys; the scalar subquery is ONE
    * tiny extra aggregate inlined into the filter, the same plan
    * shape q11_share pins.
    */
  def q22NoOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val pos = c.filter(col("c_acctbal") > 0)
      .agg(sum(dec2(col("c_acctbal"))).as("s"), count(lit(1)).as("n"))
    // "never ordered RECENTLY": the date cut keeps the anti join
    // non-vacuous at every SF (an all-time cut goes empty once each
    // customer has ordered once, which happens by sf0.01)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01")).select("o_custkey")
    c.crossJoin(broadcast(pos))
      .filter(dec2(col("c_acctbal")) * col("n") > col("s"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).cast(LongType).as("numcust"),
        moneyStr(sum(dec2(col("c_acctbal")))).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  def q22NoOrdersSql: String =
    """WITH pos AS (
      |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS totacctbal
      |FROM customer, pos
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** TPC-H Q16 shape: supplier diversity per part class —
    * COUNT(DISTINCT supplier) by (brand, type, size) over the
    * part ⋈ lineitem supply relation, EXCLUDING a blacklisted supplier
    * set (NOT IN → anti join). The blacklist (negative-balance
    * suppliers) ships as a broadcast; the distinct-count shuffles
    * (brand, type, size, suppkey) pairs once, then counts — no
    * expand-based distinct over the raw relation.
    */
  def q16PartSupp(spark: SparkSession, dir: String): DataFrame = {
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey").as("_bad"))
    val p = Tables.part(spark, dir)
      .filter(col("p_size").isin(1, 5, 9, 13))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("_bad"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  def q16PartSuppSql: String =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size IN (1, 5, 9, 13)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 shape: suppliers who moved EXCESS volume — a semi-join
    * chain: promo parts → per-(supplier, part) shipped quantity in a
    * year → suppliers where some part's volume clears a threshold →
    * supplier names. Each stage shrinks before the next join; the
    * final supplier join sees only qualifying suppkeys (semi join, no
    * payload). The reference's available-quantity subquery becomes the
    * shipped-volume aggregate our schema carries.
    */
  def q20Excess(spark: SparkSession, dir: String): DataFrame = {
    val promo = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val vol = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(promo, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec2(col("l_quantity"))).as("_v"))
      .filter(col("_v") > lit(50).cast("decimal(18,2)"))
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(vol, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  def q20ExcessSql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'PROMO'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q21 shape: the sole-blame supplier — orders where supplier
    * s shipped LATE (> 60 days after the order date) and NO OTHER
    * supplier of the same order was late: one EXISTS and one
    * NOT-EXISTS, both correlated on the same relation. Decorrelated
    * by aggregation instead of two subquery joins: per (order,
    * supplier) late flags roll up to per-order (late-supplier count,
    * the one late suppkey via conditional max), and "sole blame" is
    * the single filter n_late_supps = 1 — one shuffle on orderkey,
    * no self-join of lineitem against itself.
    */
  def q21Blame(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderdate")
    val flags = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1)
        .otherwise(0)).as("_late"))
    val blamed = flags.groupBy(col("l_orderkey"))
      .agg(sum(col("_late")).as("_n_late"),
        max(when(col("_late") === 1, col("l_suppkey"))).as("_who"),
        count(lit(1)).as("_n_supps"))
      .filter(col("_n_late") === 1 && col("_n_supps") > 1)
    blamed.groupBy(col("_who").as("s_suppkey"))
      .agg(count(lit(1)).cast(LongType).as("numwait"))
      .join(Tables.supplier(spark, dir), Seq("s_suppkey"))
      .select("s_suppkey", "s_name", "numwait")
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(25)
  }

  def q21BlameSql: String =
    """WITH flags AS (
      |  SELECT l_orderkey, l_suppkey,
      |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY l_orderkey, l_suppkey),
      |blamed AS (
      |  SELECT l_orderkey, MAX(CASE WHEN late = 1 THEN l_suppkey END) AS who
      |  FROM flags GROUP BY l_orderkey
      |  HAVING SUM(late) = 1 AND COUNT(*) > 1)
      |SELECT who AS s_suppkey, s_name, COUNT(*) AS numwait
      |FROM blamed JOIN supplier ON who = s_suppkey
      |GROUP BY who, s_name
      |ORDER BY numwait DESC, s_suppkey LIMIT 25""".stripMargin

  /** TPC-H Q2 shape: the min-cost supplier per part — a correlated
    * MIN over the supply relation, decorrelated into a per-part
    * minimum joined back by equality, then decorated with supplier /
    * nation / region dims. Unit cost is computed in INTEGER space per
    * line (cents × 100 div integral quantity — the corpus's
    * quantities are whole numbers), so the min and the equality
    * join-back are exact in both engines with no decimal-division
    * precision rules in play. The region filter prunes suppliers
    * BEFORE the supply aggregate (broadcast dims), and the per-part
    * min reuses the aggregate's partkey partitioning.
    */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame = {
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA"))
    val s = Tables.supplier(spark, dir)
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "n_name")
    val p = Tables.part(spark, dir)
      .filter(col("p_size") === 9).select("p_partkey", "p_name")
    val unit = expr(
      "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 100 DIV CAST(l_quantity AS BIGINT)")
    val supply = Tables.lineitem(spark, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"), col("s_name"), col("n_name"), col("p_name"))
      .agg(min(unit).as("cost_e4"))
    val best = supply.groupBy(col("l_partkey").as("_pk"))
      .agg(min(col("cost_e4")).as("_best"))
    supply.join(best, col("l_partkey") === col("_pk") && col("cost_e4") === col("_best"))
      .select(col("l_partkey").as("p_partkey"), col("p_name"),
        col("l_suppkey").as("s_suppkey"), col("s_name"), col("n_name"), col("cost_e4"))
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  def q2MinCostSql: String =
    """WITH s AS (
      |  SELECT s_suppkey, s_name, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA'),
      |supply AS (
      |  SELECT l_partkey, l_suppkey, s_name, n_name, p_name,
      |    MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 100
      |        // CAST(l_quantity AS BIGINT)) AS cost_e4
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN s ON l_suppkey = s_suppkey
      |  WHERE p_size = 9
      |  GROUP BY 1, 2, 3, 4, 5),
      |best AS (SELECT l_partkey AS pk, MIN(cost_e4) AS b FROM supply GROUP BY 1)
      |SELECT l_partkey AS p_partkey, p_name, l_suppkey AS s_suppkey,
      |  s_name, n_name, cost_e4
      |FROM supply JOIN best ON l_partkey = pk AND cost_e4 = b
      |ORDER BY p_partkey, s_suppkey""".stripMargin

  /** TPC-H Q8 shape: national market share per year — one nation's
    * fraction of regional revenue, two order years, rendered at fixed
    * e4 precision by integer arithmetic (the q14 pattern: no decimal
    * division). Dims broadcast; ONE shuffle for the year aggregate.
    */
  def q8Share(spark: SparkSession, dir: String): DataFrame = {
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir).filter(col("r_name") === "AMERICA"))
    val cust = Tables.customer(spark, dir)
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast(LongType).as("o_year"))
    val rev = dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))
    Tables.lineitem(spark, dir).select(col("l_orderkey"), rev.as("_rev"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("n_name") === "BRAZIL", col("_rev"))
          .otherwise(lit(0).cast("decimal(18,4)"))).as("_nat"),
        sum(col("_rev")).as("_tot"))
      .select(col("o_year"),
        expr("CAST(CAST(_nat * 10000 AS BIGINT) * 10000 DIV CAST(_tot * 10000 AS BIGINT) AS BIGINT)")
          .as("mkt_share_e4"),
        money4Str(col("_nat")).as("nation_revenue"),
        money4Str(col("_tot")).as("total_revenue"))
      .orderBy("o_year")
  }

  def q8ShareSql: String =
    """SELECT o_year,
      |  CAST(nat * 10000 AS BIGINT) * 10000 // CAST(tot * 10000 AS BIGINT) AS mkt_share_e4,
      |  CAST(CAST(nat AS DECIMAL(38,4)) AS VARCHAR) AS nation_revenue,
      |  CAST(CAST(tot AS DECIMAL(38,4)) AS VARCHAR) AS total_revenue
      |FROM (
      |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
      |    SUM(CASE WHEN n_name = 'BRAZIL'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS nat,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS tot
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'AMERICA'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1) t
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q15 shape: the top supplier(s) — an aggregated revenue
    * view, a scalar MAX over it, and an equality join-back (exact
    * decimal equality, engine-portable). The view computes once and
    * feeds both the max and the final filter.
    */
  def q15TopSupp(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec2(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))).as("_r"))
    val top = rev.agg(max(col("_r")).as("_m"))
    rev.crossJoin(broadcast(top)).filter(col("_r") === col("_m"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), money4Str(col("_r")).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  def q15TopSuppSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS r
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(CAST(r AS DECIMAL(38,4)) AS VARCHAR) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE r = (SELECT MAX(r) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q12 shape (delay-bucket proxy — the corpus has no
    * shipmode/commit/receipt columns): per shipping-delay class, how
    * many critical vs non-critical orders shipped there — the
    * join + two-branch conditional count Q12 exercises, with the
    * grouping dimension DERIVED per row (date arithmetic) instead of
    * stored.
    */
  def q12LateMode(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_class",
        when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"), "fast")
          .when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), "slow")
          .otherwise("normal"))
      .groupBy(col("delay_class"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("delay_class")
  }

  def q12LateModeSql: String =
    """SELECT
      |  CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'fast'
      |       WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 'slow'
      |       ELSE 'normal' END AS delay_class,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_mincost" -> (q2MinCost _),
    "q8_share" -> (q8Share _),
    "q12_latemode" -> (q12LateMode _),
    "q15_topsupp" -> (q15TopSupp _),
    "q16_partsupp" -> (q16PartSupp _),
    "q20_excess" -> (q20Excess _),
    "q21_blame" -> (q21Blame _),
    "q6_forecast" -> (q6Forecast _),
    "q10_returns" -> (q10Returns _),
    "q14_promo" -> (q14Promo _),
    "q17_smallqty" -> (q17SmallQty _),
    "q19_discount" -> (q19Discount _),
    "q22_noorders" -> (q22NoOrders _),
    "q1_pricing" -> (q1Pricing _),
    "q3_shipping" -> (q3Shipping _),
    "q5_regional" -> (q5Regional _),
    "q7_volume" -> (q7Volume _),
    "q9_profit" -> (q9Profit _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q4_priority" -> (q4Priority _),
    "q13_custdist" -> (q13Custdist _),
    "q11_share" -> (q11Share _),
    "q_pivot" -> (qPivot _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_corr_subquery" -> (qCorrSubquery _),
    "q_lateral" -> (qLateral _),
    "q_salted_agg" -> (qSaltedAgg _),
    "skew_salting" -> (skewSalting _),
    "q_set_ops" -> (qSetOps _),
    "q_moving_window" -> (qMovingWindow _),
    "q_window_topn" -> (qWindowTopN _),
    "q_window_funcs" -> (qWindowFuncs _),
    "q_sessionize" -> (qSessionize _),
    "q_running_total" -> (qRunningTotal _),
    "q_rollup" -> (qRollup _),
    "q_semi_returned" -> (qSemiReturned _),
    "q_anti_idle" -> (qAntiIdle _),
    "q_distinct_users" -> (qDistinctUsers _),
    "q_percentiles" -> (qPercentiles _),
    "q_cube" -> (qCube _))

  def oracles: Map[String, String] = Map(
    "q2_mincost" -> q2MinCostSql,
    "q8_share" -> q8ShareSql,
    "q12_latemode" -> q12LateModeSql,
    "q15_topsupp" -> q15TopSuppSql,
    "q16_partsupp" -> q16PartSuppSql,
    "q20_excess" -> q20ExcessSql,
    "q21_blame" -> q21BlameSql,
    "q6_forecast" -> q6ForecastSql,
    "q10_returns" -> q10ReturnsSql,
    "q14_promo" -> q14PromoSql,
    "q17_smallqty" -> q17SmallQtySql,
    "q19_discount" -> q19DiscountSql,
    "q22_noorders" -> q22NoOrdersSql,
    "q1_pricing" -> q1PricingSql,
    "q3_shipping" -> q3ShippingSql,
    "q5_regional" -> q5RegionalSql,
    "q7_volume" -> q7VolumeSql,
    "q9_profit" -> q9ProfitSql,
    "q18_large_orders" -> q18LargeOrdersSql,
    "q4_priority" -> q4PrioritySql,
    "q13_custdist" -> q13CustdistSql,
    "q11_share" -> q11ShareSql,
    "q_pivot" -> qPivotSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_corr_subquery" -> qCorrSubquerySql,
    "q_lateral" -> qLateralSql,
    "q_salted_agg" -> qSaltedAggSql,
    "skew_salting" -> skewSaltingSql,
    "q_set_ops" -> qSetOpsSql,
    "q_moving_window" -> qMovingWindowSql,
    "q_window_topn" -> qWindowTopNSql,
    "q_window_funcs" -> qWindowFuncsSql,
    "q_sessionize" -> qSessionizeSql,
    "q_running_total" -> qRunningTotalSql,
    "q_rollup" -> qRollupSql,
    "q_semi_returned" -> qSemiReturnedSql,
    "q_anti_idle" -> qAntiIdleSql,
    "q_distinct_users" -> qDistinctUsersSql,
    "q_percentiles" -> qPercentilesSql,
    "q_cube" -> qCubeSql)
}
