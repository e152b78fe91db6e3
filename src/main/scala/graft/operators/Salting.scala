package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins (SURVEY.md §4). AQE's skew-join
  * split handles most cases at runtime; salting is the static fix when
  * one key dominates so heavily that even split sub-partitions of it
  * overwhelm an executor, or when the skewed side feeds a groupBy that
  * AQE cannot split (aggregation skew).
  *
  * Mechanics: the big side gets a deterministic salt in [0, salts)
  * derived from a caller-chosen discriminator column (NOT the join
  * key — the point is to spread identical keys); the small side is
  * replicated once per salt value; the join key becomes (key, salt).
  * Result is row-identical to the unsalted join; the hot key's rows
  * now land on `salts` reducers instead of one.
  */
object Salting {

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key
    * across `salts` partitions. `discriminator` must be a big-side
    * column (or expression) that varies within a key group.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      discriminator: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val bigS = big.withColumn("__salt", pmod(hash(discriminator), lit(salts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt),
    * then final aggregate on key — the map-side-combine idea made
    * explicit for aggregates Spark cannot partially combine (e.g.
    * exact distinct via sets). `partialAgg` and `finalAgg` must
    * compose associatively.
    */
  def saltedAgg(df: DataFrame, key: String, discriminator: Column, salts: Int)(
      partialAgg: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(hash(discriminator), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(partialAgg.head, partialAgg.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
}

/** The KNOWN-WINDOW broadcast guard (r15 verdict item 5).
  *
  * The banded-signature / salt-replicated candidate frames (LSH bands,
  * minhash bands, IVF probe replicas) reach the join planner with
  * Generate-UNDERESTIMATED stats: explode's size estimate stays at the
  * child's, so the true frame is `factor`× (bands × salts × probes)
  * larger than what the static planner compares against the broadcast
  * threshold. At every SHIPPED geometry the factor is ≤
  * [[KnownWindow.MaxReplicationFactor]] and the worst
  * just-under-threshold broadcast is a bounded ~40-80 MB (the r15
  * PLANS adjudication — acceptable, and those joins are measured-hot,
  * so their planning is deliberately untouched). The guard exists for
  * the FUTURE geometry bump: a caller raising bands/salts past the
  * adjudicated bound would silently scale the broadcast error with it
  * — the exact mechanism of the r14 sharded-simhash Generate-broadcast
  * failure. Past the ceiling the replicated side is merge-pinned:
  * row-identical by join semantics (spec-pinned in KnownWindowSpec),
  * never planner-eligible for a size-blind broadcast.
  */
object KnownWindow {

  /** The adjudicated replication-factor bound: the largest shipped
    * geometry (ann_lsh production 8 bands × salt 4; minhash salt-split
    * 4 bands × salt 8) lands exactly here, so every existing plan is
    * untouched and the first geometry past it gets the pin.
    */
  val MaxReplicationFactor = 32L

  /** `df` whose true row count is `factor`× its planner estimate
    * (Generate replication): merge-pinned past the ceiling, untouched
    * at adjudicated geometries.
    */
  def guard(df: DataFrame, factor: Long): DataFrame = {
    frames.incrementAndGet()
    maxFactor.updateAndGet(m => math.max(m, factor))
    if (factor > MaxReplicationFactor) { pins.incrementAndGet(); df.hint("merge") }
    else df
  }

  // audit counters (BroadcastAudit prints them in its summary): every
  // Generate-underestimated frame that flowed through the guard this
  // JVM, the largest factor seen, and how many got the past-ceiling
  // pin — so an audit run's residual broadcast-over-Generate findings
  // are self-describing as adjudicated-bounded (≤ the ceiling) rather
  // than unexamined
  private val frames = new java.util.concurrent.atomic.AtomicLong(0)
  private val maxFactor = new java.util.concurrent.atomic.AtomicLong(0)
  private val pins = new java.util.concurrent.atomic.AtomicLong(0)

  /** (guarded frames, max factor seen, past-ceiling pins) since JVM start. */
  def stats: (Long, Long, Long) = (frames.get, maxFactor.get, pins.get)
}
