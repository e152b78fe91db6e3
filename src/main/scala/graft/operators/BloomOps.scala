package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bloom-filter family: a deterministic, oracle-portable Bloom sketch
  * (per-group bitmap table + bounded membership probes) and the
  * operator it exists for at 100 TB — `opt_bloom_join`, runtime
  * semi-join reduction: build the filter over a FILTERED dimension's
  * keys, broadcast the constant-size bitmap, and prune the fact side
  * BEFORE its shuffle, so rows that cannot join never cross an
  * exchange (Bloom 1970; the same idea Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` injects — done
  * here explicitly so the construction is engine-portable and the
  * pruned plan is spec-pinned rather than optimizer-dependent).
  *
  * Determinism: bit positions come from the portable 60-bit hash
  * ([[graft.functions.Hash60]]) with per-hash salts, so both engines
  * build bit-identical bitmaps. Words are 32 bits wide stored in
  * BIGINT — shifts never reach a sign bit on either engine.
  *
  * Scale posture: the bitmap is CONSTANT-size ([[BloomWords]] rows per
  * group / one [[BloomWords]]-entry map for the join filter) no matter
  * the input; building it is one map-side-combined `bit_or` groupBy of
  * ≤ groups × [[BloomWords]] rows; probing is row-local arithmetic
  * against a broadcast. No raw-row self-join anywhere. False positives
  * cost only wasted probe work — `opt_bloom_join`'s final join removes
  * them, so the ANSWER is exact and the oracle is the plain join SQL.
  */
object BloomOps {

  /** m: filter size in bits. At the gate's key cardinalities (≲ 300
    * per group) the fill stays ≈ 25% → FP rate ≈ 0.4%; at production
    * cardinalities m is the knob (bits/key ≈ 10 for 1% FP) — the
    * construction below is geometry-independent.
    */
  val BloomBits = 4096

  /** Stored-word width: 32 bits in a BIGINT so `1 << (pos % 32)` stays
    * positive on both engines (a 64-bit word's sign bit round-trips
    * differently through DuckDB's overflow checks).
    */
  val WordBits = 32

  val BloomWords: Int = BloomBits / WordBits

  /** k: hash functions per item. */
  val BloomK = 4

  /** Bit positions of an item expression: the k salted portable hashes
    * mod m, hashed in ONE batch-native Hash60All call (per-element
    * graft_hash60 dispatch inside a lambda is the pattern Hash60All
    * exists to avoid).
    */
  private[graft] def posAllExpr(item: String): String =
    s"transform(graft_hash60_all(transform(sequence(0, ${BloomK - 1}), " +
      s"i -> concat('bf', cast(i as string), ':', cast($item as string)))), " +
      s"h -> h % $BloomBits)"

  private def hashDuck(item: String): String =
    graft.functions.Portable.hash60Duck(
      s"CONCAT('bf', CAST(i AS VARCHAR), ':', CAST($item AS VARCHAR))")

  /** Per-group Bloom bitmap as a (group, word_idx, bits) table — the
    * storable/mergeable sketch form (word-wise `bit_or` is the merge
    * monoid, like the HLL registers' max and the CMS counters' sum).
    * ONE shuffled groupBy of ≤ groups × [[BloomWords]] rows after
    * map-side partials — constant in input size. Never-set words have
    * no row (identically absent on both engine sides).
    */
  private[graft] def bloomWords(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), explode(expr(posAllExpr("user_id"))).as("pos"))
      .groupBy(col("event_type"), expr(s"pos div $WordBits").as("word_idx"))
      .agg(expr(s"bit_or(shiftleft(cast(1 as bigint), cast(pos % $WordBits as int)))")
        .as("bits"))

  /** Gate entry: the per-event-type Bloom bitmap over the user-id
    * stream.
    */
  def sketchBloom(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    bloomWords(Tables.events(spark, dir))
      .orderBy("event_type", "word_idx")
  }

  def sketchBloomSql: String =
    s"""WITH pos AS (
       |  SELECT event_type, ${hashDuck("user_id")} % $BloomBits AS pos
       |  FROM events, generate_series(0, ${BloomK - 1}) AS t(i))
       |SELECT event_type, CAST(pos // $WordBits AS BIGINT) AS word_idx,
       |  CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % $WordBits AS INTEGER)) AS BIGINT) AS bits
       |FROM pos GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Bounded probe-id space for the membership gate entry: covers the
    * whole present id range plus an equal absent band, fixed size at
    * every corpus scale (the bounded-probe contract ann_bruteforce and
    * sketch_cms_est established).
    */
  val ProbeUsers = 300L

  /** Membership reads FROM the sketch: for each (group, candidate id),
    * hit = all k bits set. Deterministic integers → full oracle; the
    * no-false-negative guarantee is spec-pinned separately. The sketch
    * side is ≤ groups × [[BloomWords]] rows → BROADCAST; probes are a
    * generated constant-size frame; the raw event stream is touched
    * only by the sketch build.
    */
  def sketchBloomProbe(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val events = Tables.events(spark, dir)
    val probes = events.select("event_type").distinct()
      .crossJoin(spark.range(0, ProbeUsers).select(col("id").as("user_id")))
    probes
      .select(col("event_type"), col("user_id"),
        explode(expr(posAllExpr("user_id"))).as("pos"))
      .select(col("event_type"), col("user_id"),
        expr(s"pos div $WordBits").as("word_idx"),
        expr(s"cast(pos % $WordBits as int)").as("bit_i"))
      .join(broadcast(bloomWords(events)), Seq("event_type", "word_idx"), "left_outer")
      .select(col("event_type"), col("user_id"),
        expr("shiftright(coalesce(bits, cast(0 as bigint)), bit_i) & 1").as("ok"))
      .groupBy("event_type", "user_id")
      .agg(min("ok").cast(LongType).as("hit"))
      .orderBy("event_type", "user_id")
  }

  def sketchBloomProbeSql: String =
    s"""WITH pos AS (
       |  SELECT event_type, ${hashDuck("user_id")} % $BloomBits AS pos
       |  FROM events, generate_series(0, ${BloomK - 1}) AS t(i)),
       |bloom AS (
       |  SELECT event_type, pos // $WordBits AS word_idx,
       |    bit_or(CAST(1 AS BIGINT) << CAST(pos % $WordBits AS INTEGER)) AS bits
       |  FROM pos GROUP BY 1, 2),
       |probes AS (
       |  SELECT g.event_type, CAST(u.uid AS BIGINT) AS user_id,
       |    ${hashDuck("u.uid")} % $BloomBits AS pos
       |  FROM (SELECT DISTINCT event_type FROM events) g,
       |    generate_series(0, ${ProbeUsers - 1}) AS u(uid),
       |    generate_series(0, ${BloomK - 1}) AS t(i))
       |SELECT p.event_type, p.user_id,
       |  CAST(MIN((COALESCE(b.bits, 0) >> CAST(p.pos % $WordBits AS INTEGER)) & 1) AS BIGINT) AS hit
       |FROM probes p LEFT JOIN bloom b
       |  ON b.event_type = p.event_type AND b.word_idx = p.pos // $WordBits
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The whole filter as ONE row carrying a word_idx → bits map —
    * the broadcastable form `opt_bloom_join` ships to the fact side.
    * Fixed size by construction (≤ [[BloomWords]] entries), so the
    * explicit `broadcast()` respects the repo's only-fixed-size-dims
    * rule regardless of how many keys went in.
    */
  private[graft] def bloomFrameOf(keys: DataFrame, keyCol: String): DataFrame =
    keys
      .select(explode(expr(posAllExpr(keyCol))).as("pos"))
      .groupBy(expr(s"pos div $WordBits").as("w"))
      .agg(expr(s"bit_or(shiftleft(cast(1 as bigint), cast(pos % $WordBits as int)))")
        .as("bits"))
      .agg(expr("map_from_entries(collect_list(struct(w, bits)))").as("bm"))

  /** Row-local membership predicate against the one-row map frame's
    * `bm` column: all k bits set. One Hash60All batch per row, then
    * pure arithmetic over the 4-element array.
    */
  private[graft] def memberExpr(bmCol: String, keyCol: String): String =
    s"forall(${posAllExpr(keyCol)}, p -> " +
      s"(shiftright(coalesce(element_at($bmCol, p div $WordBits), cast(0 as bigint)), " +
      s"cast(p % $WordBits as int)) & 1) = 1)"

  /** Runtime semi-join reduction: orders ⋈ customer(BUILDING), with
    * the fact side pre-pruned by the filtered dimension's Bloom before
    * any shuffle. At 100 TB this is THE join-shuffle killer: the fact
    * scan's survivors drop to matches + the FP margin (~0.4% here)
    * without materializing the dimension's key set anywhere — the
    * bitmap stays [[BloomWords]] longs however large the dimension
    * grows. The final equi-join (strategy left to AQE — the filtered
    * dimension SCALES with the corpus, so no forced broadcast there)
    * removes false positives, so the answer is EXACT and the oracle is
    * the plain join SQL; the prune's row-count effect and
    * no-false-negative equivalence are spec-pinned
    * (BloomOpsSpec).
    */
  def optBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    prunedOrders(spark, dir, cust)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast(LongType).as("n_orders"),
        graft.functions.Portable.moneyStr(
          sum(graft.functions.Portable.dec2(col("o_totalprice")))).as("sum_total"))
      .orderBy("o_orderpriority")
  }

  /** The bloom-pruned fact frame — shared by the gate entry and the
    * spec's prune-effect assertions.
    */
  private[graft] def prunedOrders(spark: SparkSession, dir: String,
      dimKeys: DataFrame): DataFrame =
    Tables.orders(spark, dir)
      .crossJoin(broadcast(bloomFrameOf(dimKeys, "c_custkey")))
      .filter(expr(memberExpr("bm", "o_custkey")))

  def optBloomJoinSql: String =
    """SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_total
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_bloom" -> (sketchBloom _),
    "sketch_bloom_probe" -> (sketchBloomProbe _),
    "opt_bloom_join" -> (optBloomJoin _))

  def oracles: Map[String, String] = Map(
    "sketch_bloom" -> sketchBloomSql,
    "sketch_bloom_probe" -> sketchBloomProbeSql,
    "opt_bloom_join" -> optBloomJoinSql)
}
