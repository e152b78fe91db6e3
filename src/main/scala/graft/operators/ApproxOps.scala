package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sketch operators for 100 TB-scale counting and ranking: a
  * mergeable HyperLogLog distinct-count register table, a KMV/theta
  * bottom-k sketch (distinct counts PLUS set-operation estimates),
  * Misra-Gries two-pass heavy hitters (approximation internal, output
  * exact), and histogram quantiles (exact on fixed-decimal data).
  * Common design: the approximation bounds SHUFFLE VOLUME (registers,
  * hash samples, candidates, bins — never the raw rows), and
  * everything oracle-checked stays in deterministic integer space.
  *
  * Exact `COUNT(DISTINCT key)` shuffles every distinct key
  * (q_distinct_users' two-phase expand); a HyperLogLog register sketch
  * reduces the shuffle to `groups × m` rows — constant per group, no
  * matter how many billions of keys stream through — and the register
  * maxima are MERGEABLE (register-wise max), so per-partition /
  * per-day sketches union into exact global registers without
  * re-reading the raw data. That is the property that makes distinct
  * counting feasible in a streaming or incremental 100 TB pipeline.
  *
  * Portability: the whole sketch is deterministic integer arithmetic
  * on the portable 60-bit md5 hash — bucket = h mod m, rho = leading
  * zeros of the remaining 52-bit field + 1 (via the base-2 string
  * rendering both engines share) — so the DuckDB oracle reproduces
  * the register table bit-for-bit. Only the final float estimate
  * (derived register-side in [[estimate]]) leaves integer space,
  * and it never crosses the oracle gate.
  */
object ApproxOps {

  /** Register count m (2^8): bucket index is the low 8 bits of the
    * 60-bit hash, the rho scan runs over the remaining 52.
    */
  val HllBuckets = 256
  private val RhoWidth = 52 // 60 hash bits - 8 bucket bits
  private val RhoMax = RhoWidth + 1

  /** The register fold over an events-shaped frame — ONE derivation
    * shared by the batch sketch and the STREAMING register maintainer
    * ([[graft.streaming.StreamImport]]'s stream_hll): batch and
    * stream must agree bucket-for-bucket because they answer the same
    * oracle. Caller registers graft functions on the frame's session.
    */
  private[graft] def hllRegisters(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("graft_hash60(cast(user_id as string))").as("h"))
      .select(col("event_type"),
        expr(s"h % $HllBuckets").as("bucket"),
        expr(s"CASE WHEN h div $HllBuckets = 0 THEN $RhoMax " +
          s"ELSE $RhoMax - length(bin(h div $HllBuckets)) END").as("rho"))
      .groupBy("event_type", "bucket")
      .agg(max("rho").cast(LongType).as("max_rho"))

  /** Per-event-type HLL register table over distinct users: ONE
    * shuffled groupBy of (type, bucket) — at most `types × 256` rows
    * cross the exchange after map-side partial max.
    */
  def sketchHll(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    hllRegisters(Tables.events(spark, dir))
      .orderBy("event_type", "bucket")
  }

  def sketchHllSql: String = {
    val h = graft.functions.Portable.hash60Duck("CAST(user_id AS VARCHAR)")
    s"""WITH h AS (SELECT event_type, $h AS h FROM events)
       |SELECT event_type, h % $HllBuckets AS bucket,
       |  CAST(MAX(CASE WHEN h // $HllBuckets = 0 THEN $RhoMax
       |           ELSE $RhoMax - length(bin(h // $HllBuckets)) END) AS BIGINT) AS max_rho
       |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Merge sketches: register-wise max. Exactly the union sketch —
    * merging per-partition/per-day register tables is how the 100 TB
    * path counts without touching raw history.
    */
  def merge(sketches: Seq[Map[Long, Long]]): Map[Long, Long] =
    sketches.foldLeft(Map.empty[Long, Long]) { (acc, s) =>
      s.foldLeft(acc) { case (a, (b, r)) => a.updated(b, math.max(a.getOrElse(b, 0L), r)) }
    }

  /** Standard HLL estimator (Flajolet et al. 2007) over a register
    * map (absent bucket = empty register), with the small-range
    * linear-counting correction. Driver-side float math on m values —
    * never part of an oracle-checked frame.
    */
  def estimate(registers: Map[Long, Long], m: Int = HllBuckets): Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val sum = (0 until m).map(j => math.pow(2.0, -registers.getOrElse(j.toLong, 0L).toDouble)).sum
    val e = alpha * m * m / sum
    val zeros = (0 until m).count(j => registers.getOrElse(j.toLong, 0L) == 0L)
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Misra-Gries counter budget per partition. The union of
    * per-partition MG(k) candidate sets PROVABLY contains every item
    * with global frequency > n/k (if count(t) > Σ n_p/k, then
    * count_p(t) > n_p/k for some p, and MG(k) never evicts such an
    * item) — so with a final threshold of n/50 > n/64, candidate
    * pruning loses nothing. Spec-pinned against the naive groupBy.
    */
  val TopkCounters = 64

  /** Heavy hitters (tokens with ≥ 2% of all token mass) by the
    * two-pass sketch pattern a 100 TB corpus needs:
    *
    *   pass 1 — per-partition Misra-Gries summaries (row-local
    *   `mapPartitions`, NO shuffle of the raw tokens), emitting a
    *   candidate set bounded by counters × partitions;
    *   pass 2 — exact counts of the candidates only (the token stream
    *   is pruned by a broadcast semi-join against the bounded
    *   candidate list before the only groupBy).
    *
    * The approximation is INTERNAL: MG only prunes, the verify pass is
    * exact, so the output is bit-identical to the naive full groupBy —
    * which is exactly what the DuckDB oracle computes. What scale buys:
    * the shuffled aggregate sees only candidate rows, not the full
    * token multiset (vocabularies at corpus scale are heavy-tailed;
    * the naive groupBy shuffles every distinct token).
    */
  def sketchTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def tok = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
    // pass 1 sees every token anyway — emit the per-partition token
    // COUNT beside the candidate keys so the scalar total needs no
    // extra corpus scan; the ≤ (counters+1) × partitions row summary
    // materializes once for its two consumers
    val summaries = graft.Scratch.cp(tok.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var np = 0L
      it.foreach { t =>
        np += 1L
        if (counters.contains(t)) counters(t) += 1L
        else if (counters.size < TopkCounters) counters(t) = 1L
        else {
          // decrement-all: every counter loses one; zeros evict
          val dead = List.newBuilder[String]
          counters.keysIterator.foreach { key =>
            val v = counters(key) - 1L
            if (v == 0L) dead += key else counters(key) = v
          }
          dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator.map(t => (t, true, 0L)) ++
        Iterator(("", false, np))
    }.toDF("t", "is_cand", "cnt"))
    val candidates = summaries.filter(col("is_cand")).select("t").distinct()
    val total = summaries.filter(!col("is_cand"))
      .agg(sum("cnt").cast(LongType).as("n"))
    val result = tok.join(broadcast(candidates), "t") // bounded: counters × partitions
      .groupBy("t").agg(count(lit(1)).cast(LongType).as("c"))
      .crossJoin(broadcast(total)) // one row
      .filter(col("c") * 50 >= col("n")) // c ≥ n/50, integer-exact
      .select(col("t"), col("c"))
    graft.Scratch.seal(result, summaries).orderBy("t")
  }

  /** The oracle is the NAIVE exact computation — the MG pruning must
    * be invisible in the result.
    */
  def sketchTopkSql: String =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |n AS (SELECT COUNT(*) AS n FROM tok)
      |SELECT t, COUNT(*) AS c
      |FROM tok, n GROUP BY t, n.n
      |HAVING COUNT(*) * 50 >= n
      |ORDER BY t""".stripMargin

  /** Bottom-k sketch size. 2^60 is the hash space — the estimator's
    * scale constant.
    */
  val KmvK = 32
  private val HashSpace = math.pow(2.0, 60)

  /** KMV / bottom-k distinct sketch (the theta-sketch family): per
    * group, the k SMALLEST distinct 60-bit hashes of the key. Where
    * HLL compresses to registers (union-only), a KMV sketch is a SET
    * of real hash samples — so sketches also support INTERSECTION /
    * difference estimates ([[kmvIntersectEstimate]]), the set
    * operations registers cannot answer. The sketch rows themselves
    * are exact integers with a full oracle (k smallest distinct
    * hashes is a deterministic set); only the driver-side estimators
    * leave integer space.
    *
    * Scale posture: pass 1 is a per-partition DISTINCT bottom-k
    * (row-local `mapPartitions` with one capped tree per group — the
    * [[sketchTopk]] pattern), so the raw key stream never shuffles; a
    * plain rank<=k window pre-trim would be WRONG here (duplicate
    * hashes of a hot key could evict genuinely smaller distinct
    * hashes from the per-partition cut). Pass 2 ranks the ≤
    * groups × k × partitions candidate rows — bottom-k is a monoid
    * (bottom-k of unions = bottom-k of concatenated bottom-ks,
    * spec-pinned), so the merged result is EXACTLY the global sketch.
    */
  def sketchKmv(spark: SparkSession, dir: String): DataFrame =
    kmvSketch(spark, dir).orderBy("event_type", "rnk")

  /** The UNSORTED sketch — consumed by [[sketchSetOps]] (whose
    * groupBy would otherwise sit on top of the gate projection's
    * needless range exchange) and sorted by [[sketchKmv]] for the
    * oracle gate.
    */
  private def kmvSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val hashed = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("graft_hash60(cast(user_id as string))").as("h"))
      .as[(String, Long)]
    val candidates = hashed.mapPartitions { it =>
      val perGroup = scala.collection.mutable.HashMap
        .empty[String, java.util.TreeSet[java.lang.Long]]
      it.foreach { case (g, h) =>
        val set = perGroup.getOrElseUpdate(g, new java.util.TreeSet[java.lang.Long]())
        set.add(h)
        if (set.size > KmvK) set.pollLast() // keep the k smallest
      }
      perGroup.iterator.flatMap { case (g, set) =>
        val out = new Array[(String, Long)](set.size)
        val i = set.iterator()
        var j = 0
        while (i.hasNext) { out(j) = (g, i.next()); j += 1 }
        out.iterator
      }
    }.toDF("event_type", "h").distinct() // ≤ groups × k × partitions rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("h")
    candidates.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= KmvK)
      .select(col("event_type"), col("rnk"), col("h"))
  }

  /** The oracle is the NAIVE exact bottom-k over the distinct hash
    * set — the per-partition pruning must be invisible in the result.
    */
  def sketchKmvSql: String = {
    val h = graft.functions.Portable.hash60Duck("CAST(user_id AS VARCHAR)")
    s"""WITH d AS (SELECT DISTINCT event_type, $h AS h FROM events)
       |SELECT event_type, rnk, h FROM (
       |  SELECT event_type, h,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS BIGINT) AS rnk
       |  FROM d) t
       |WHERE rnk <= $KmvK
       |ORDER BY event_type, rnk""".stripMargin
  }

  /** Merge bottom-k sketches: k smallest of the deduped union — the
    * monoid property that lets per-partition/per-day sketches combine
    * into the exact global sketch.
    */
  def kmvMerge(sketches: Seq[Seq[Long]], k: Int = KmvK): Seq[Long] =
    sketches.flatten.distinct.sorted.take(k)

  /** Theta-style SET OPERATIONS answered entirely from the bottom-k
    * sketches — the query family (distinct intersections across
    * groups) that register sketches cannot serve and exact
    * COUNT(DISTINCT) would answer with a full shuffle of both key
    * sets. Per event-type pair: the shared threshold θ (an
    * unsaturated sketch sampled its whole set, so its θ is the full
    * 2^60 space — by SIZE, never by value, see
    * [[kmvIntersectEstimate]]) and the count of common hashes below
    * θ. Both are DETERMINISTIC integers, so the query carries a full
    * DuckDB oracle; the float estimate (n_common · 2^60 / θ) stays
    * driver-side. One size-k formula covers every saturation mix:
    * with both sketches complete, θ = 2^60 exceeds every hash and
    * n_common is the EXACT intersection.
    *
    * Scale posture: all pair arithmetic runs over the k-row sketches
    * (groups × k rows total), never the raw corpus — the sketch IS
    * the shuffle bound.
    */
  def sketchSetOps(spark: SparkSession, dir: String): DataFrame = {
    val full = 1L << 60
    val agg = kmvSketch(spark, dir)
      .groupBy("event_type")
      .agg(sort_array(collect_list("h")).as("hs"))
    val a = agg.select(col("event_type").as("type_a"), col("hs").as("ha"))
    val b = agg.select(col("event_type").as("type_b"), col("hs").as("hb"))
    a.join(b, col("type_a") < col("type_b"))
      .withColumn("theta",
        least(
          when(size(col("ha")) < KmvK, full).otherwise(element_at(col("ha"), -1)),
          when(size(col("hb")) < KmvK, full).otherwise(element_at(col("hb"), -1))))
      .withColumn("n_common",
        expr("CAST(size(filter(array_intersect(ha, hb), x -> x < theta)) AS BIGINT)"))
      .select(col("type_a"), col("type_b"), col("theta"), col("n_common"))
      .orderBy("type_a", "type_b")
  }

  def sketchSetOpsSql: String = {
    val h = graft.functions.Portable.hash60Duck("CAST(user_id AS VARCHAR)")
    val full = 1L << 60
    s"""WITH d AS (SELECT DISTINCT event_type, $h AS h FROM events),
       |r AS (SELECT event_type, h,
       |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rnk
       |      FROM d),
       |s AS (SELECT event_type, list(h ORDER BY h) AS hs
       |      FROM r WHERE rnk <= $KmvK GROUP BY event_type),
       |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
       |        a.hs AS ha, b.hs AS hb,
       |        LEAST(CASE WHEN len(a.hs) < $KmvK THEN $full ELSE a.hs[-1] END,
       |              CASE WHEN len(b.hs) < $KmvK THEN $full ELSE b.hs[-1] END) AS theta
       |      FROM s a JOIN s b ON a.event_type < b.event_type)
       |SELECT type_a, type_b, theta,
       |  CAST(len(list_filter(list_intersect(ha, hb), x -> x < theta)) AS BIGINT) AS n_common
       |FROM p ORDER BY type_a, type_b""".stripMargin
  }

  /** KMV estimator: with k-th smallest hash h_k over a space of 2^60,
    * distinct ≈ (k−1) · 2^60 / h_k. A sketch smaller than k saw every
    * distinct value — return the exact size. Driver-side float math,
    * never part of an oracle-checked frame.
    */
  def kmvEstimate(sketch: Seq[Long], k: Int = KmvK): Double =
    if (sketch.size < k) sketch.size.toDouble
    else (k - 1).toDouble * HashSpace / sketch.max.toDouble

  /** Theta-style intersection estimate: under the shared threshold
    * θ = min(θ_A, θ_B), both sketches are uniform samples of their
    * sets, so |A∩B| ≈ |{h ∈ A∩B : h < θ}| · 2^60 / θ. An UNSATURATED
    * sketch (size < k) sampled its whole set, so its threshold is the
    * full hash space — never its largest real sample (treating a
    * complete set's max as a cut would zero out or crash mixed-
    * saturation pairs). Both-unsaturated pairs intersect exactly.
    * This is the query family (intersections, differences) that
    * register sketches cannot answer — the reason production
    * pipelines keep a theta/KMV sketch next to HLL.
    */
  def kmvIntersectEstimate(a: Seq[Long], b: Seq[Long], k: Int = KmvK): Double = {
    // saturation is a fact about SIZE (the sketch was cut at k), never
    // about the threshold's numeric value: a saturated sketch whose
    // max sits in 2^60's double-rounding neighborhood (e.g. 2^60 − 1,
    // which rounds to 2^60 exactly in a double) must not be misrouted
    // to the exact-intersection path
    val aSat = a.size >= k
    val bSat = b.size >= k
    if (!aSat && !bSat) return a.toSet.intersect(b.toSet).size.toDouble
    // the shared threshold in exact Long space; an unsaturated side's
    // threshold is the full space, so the saturated side's max decides
    val theta: Long =
      if (aSat && bSat) math.min(a.max, b.max)
      else if (aSat) a.max
      else b.max
    val common = a.toSet.intersect(b.toSet).count(_ < theta)
    common * HashSpace / theta.toDouble
  }

  /** Percentiles via a value histogram — the scale path for
    * [[Analytics.qPercentiles]]'s per-group positional window, and
    * EXACT here, not approximate: the corpus values carry two
    * decimals, so e2 binning is lossless and "smallest bin with
    * cumulative count ≥ rank" picks the identical element the
    * positional form does (ties in value cannot change the picked
    * VALUE). It answers the SAME oracle as q_percentiles.
    *
    * What scale buys: the shuffle carries one row per DISTINCT
    * (group, value) bin after map-side partial counting, and the only
    * ordered pass runs over bins, not rows — vs the window form's
    * full per-group row sort. For true continuous data the same plan
    * with a coarser bin becomes the classic ε-approximate histogram
    * quantile (ε = bin width), same shapes.
    */
  def sketchQuantile(spark: SparkSession, dir: String): DataFrame =
    quantileFromHist(quantileHist(Tables.events(spark, dir)))

  /** The histogram STATE of the quantile sketch — one count per
    * distinct (group, e2-binned value). This is the part a STREAMING
    * maintainer keeps (counter increments are commutative sums, like
    * the CMS table): stream_quantile maintains exactly this frame in
    * update mode and derives the percentiles from the read-back.
    */
  private[graft] def quantileHist(events: DataFrame): DataFrame = {
    import graft.functions.Portable.dec2
    events
      .groupBy(col("event_type"), dec2(col("value")).as("v"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The READ path: bins → percentiles (cumulative pass over bins,
    * never rows). Shared by the batch sketch and the streaming
    * maintainer's read-back so the two can never drift.
    */
  private[graft] def quantileFromHist(hist: DataFrame): DataFrame = {
    import graft.functions.Portable.moneyStr
    val byV = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("v")
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
    hist
      .withColumn("cum", sum("cnt").over(byV))
      .withColumn("n", sum("cnt").over(all))
      .groupBy("event_type")
      .agg(
        moneyStr(min(when(col("cum") >= expr("CAST(FLOOR((n - 1) * 0.5) AS BIGINT) + 1"), col("v")))).as("p50"),
        moneyStr(min(when(col("cum") >= expr("CAST(FLOOR((n - 1) * 0.95) AS BIGINT) + 1"), col("v")))).as("p95"),
        max(col("n")).as("n"))
      .orderBy("event_type")
  }

  /** Count-min sketch geometry: depth (independent hash rows) × width
    * (counters per row). The frequency-estimation member of the sketch
    * family — HLL answers "how many distinct", KMV answers set
    * operations, Misra-Gries answers "which are heavy" (exactly), CMS
    * answers "how often does THIS item occur" for ANY item in
    * O(depth) counter reads, with the one-sided guarantee
    * est ≥ true count (Cormode & Muthukrishnan 2005). Width 64 /
    * depth 4 keeps the whole table at groups × 256 counters — same
    * footprint class as the HLL registers.
    */
  val CmsDepth = 4
  val CmsWidth = 64

  /** The counter fold over an events-shaped frame — ONE derivation
    * shared by the batch sketch and the STREAMING maintainer
    * ([[graft.streaming.StreamImport]]'s stream_cms), which must agree
    * counter-for-counter because they answer the same oracle. Row i's
    * hash is the portable 60-bit hash of "i:item" (per-row
    * independence via the salt prefix), column = hash mod width.
    * Counter increments are SUMS — commutative, so partition order and
    * micro-batch splits are invisible, and per-partition sketches
    * merge into the exact global sketch by counter-wise addition
    * (spec-pinned): the property that lets per-day/per-shard sketches
    * union at 100 TB without re-reading raw history.
    *
    * Scale posture: after map-side partial counting, at most
    * groups × depth × width counter rows cross the exchange — constant
    * in input size, like the HLL registers. Absent counters are zero
    * (never incremented) on both engine sides alike.
    */
  private[graft] def cmsCounters(events: DataFrame): DataFrame =
    events
      // salted strings built by the (interpreted) transform lambda,
      // hashed in ONE batch-native Hash60All call — per-element
      // graft_hash60 dispatch inside the lambda is the exact pattern
      // Hash60All exists to avoid (runs per event row × depth)
      .select(col("event_type"), posexplode(expr(
        s"graft_hash60_all(transform(sequence(0, ${CmsDepth - 1}), " +
          "i -> concat(cast(i as string), ':', cast(user_id as string))))"))
        .as(Seq("row_i", "h")))
      .select(col("event_type"),
        col("row_i").cast(LongType).as("row_i"),
        expr(s"h % $CmsWidth").as("col_i"))
      .groupBy("event_type", "row_i", "col_i")
      .agg(count(lit(1)).cast(LongType).as("cnt"))

  /** Per-event-type CMS counter table over the user-id stream: ONE
    * shuffled groupBy of (type, row, col).
    */
  def sketchCms(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    cmsCounters(Tables.events(spark, dir))
      .orderBy("event_type", "row_i", "col_i")
  }

  def sketchCmsSql: String = {
    val h = graft.functions.Portable.hash60Duck(
      "CONCAT(CAST(i AS VARCHAR), ':', CAST(user_id AS VARCHAR))")
    s"""WITH x AS (
       |  SELECT event_type, CAST(i AS BIGINT) AS row_i, $h % $CmsWidth AS col_i
       |  FROM events, generate_series(0, ${CmsDepth - 1}) AS t(i))
       |SELECT event_type, row_i, col_i, CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM x GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  /** Point-frequency estimates read FROM the sketch: for each probe
    * (type, user), est = min over the depth counters the item hashes
    * to — deterministic integers, so the whole read path carries a
    * full oracle; the ≥-exact guarantee is spec-pinned separately.
    * Probe set bounded by construction (user_id ≡ 0 mod 97 — the
    * bounded-probe contract, same posture as ann_bruteforce's gate
    * shape).
    *
    * Scale posture: the sketch is ≤ groups × depth × width rows →
    * BROADCAST to the probe side; the raw event stream is touched
    * only by the sketch build's constant-width aggregation and the
    * probes' pushed-down filter — no raw-row self-join anywhere.
    */
  def sketchCmsEst(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val events = Tables.events(spark, dir)
    val probes = events.filter(col("user_id") % 97 === 0)
      .select("event_type", "user_id").distinct()
      .select(col("event_type"), col("user_id"), posexplode(expr(
        s"transform(sequence(0, ${CmsDepth - 1}), " +
          "i -> graft_hash60(concat(cast(i as string), ':', cast(user_id as string))))"))
        .as(Seq("row_i", "h")))
      .select(col("event_type"), col("user_id"),
        col("row_i").cast(LongType).as("row_i"),
        expr(s"h % $CmsWidth").as("col_i"))
    probes.join(broadcast(cmsCounters(events)), Seq("event_type", "row_i", "col_i"))
      .groupBy("event_type", "user_id")
      .agg(min("cnt").cast(LongType).as("est"))
      .orderBy("event_type", "user_id")
  }

  def sketchCmsEstSql: String = {
    val h = graft.functions.Portable.hash60Duck(
      "CONCAT(CAST(i AS VARCHAR), ':', CAST(user_id AS VARCHAR))")
    s"""WITH cms AS (
       |  SELECT event_type, CAST(i AS BIGINT) AS row_i, $h % $CmsWidth AS col_i,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM events, generate_series(0, ${CmsDepth - 1}) AS t(i)
       |  GROUP BY 1, 2, 3),
       |probes AS (
       |  SELECT DISTINCT event_type, user_id, CAST(i AS BIGINT) AS row_i,
       |    $h % $CmsWidth AS col_i
       |  FROM events, generate_series(0, ${CmsDepth - 1}) AS t(i)
       |  WHERE user_id % 97 = 0)
       |SELECT p.event_type, p.user_id, CAST(MIN(c.cnt) AS BIGINT) AS est
       |FROM probes p JOIN cms c
       |  ON c.event_type = p.event_type AND c.row_i = p.row_i AND c.col_i = p.col_i
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Merge CMS sketches: counter-wise SUM (absent = 0) — the additive
    * monoid that unions per-partition/per-day sketches into the exact
    * global table.
    */
  def cmsMerge(sketches: Seq[Map[(Long, Long), Long]]): Map[(Long, Long), Long] =
    sketches.foldLeft(Map.empty[(Long, Long), Long]) { (acc, s) =>
      s.foldLeft(acc) { case (a, (rc, n)) => a.updated(rc, a.getOrElse(rc, 0L) + n) }
    }

  /** Driver-side point read of a sketch map ((row, col) → count):
    * est(item) = min over the depth counters "i:item" hashes to,
    * absent = 0. One-sided: est ≥ true count always; est ≤ true +
    * ε·N with probability 1 − δ for ε = e/width, δ = e^−depth
    * (Cormode & Muthukrishnan 2005). The same rule the oracled
    * sketch_cms_est frame computes in-engine.
    */
  def cmsEstimate(sketch: Map[(Long, Long), Long], item: String): Long =
    (0 until CmsDepth).map { i =>
      val h = graft.functions.Hash60.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$i:$item"))
      sketch.getOrElse((i.toLong, h % CmsWidth), 0L)
    }.min

  /** Trailing window of the sliding-window cardinality sketch, in
    * HOURS (window = this hour and the two before it).
    */
  val HllWindowHours = 3L

  /** Sliding-window distinct counting — "unique users over the last
    * N hours, per type, at every hour" — the dashboard read that is
    * IMPOSSIBLE to keep exactly at 100 TB (exact would re-scan N
    * hours of raw history per tick) and trivial with a mergeable
    * sketch: keep ONE register table per (type, hour) — the same
    * shuffle-bounded build as sketch_hll, ≤ types × hours × 256 rows
    * after map-side partial max — then the trailing-window union is
    * register-wise MAX over a RANGE frame on the hour axis, computed
    * entirely ON THE SKETCH TABLE (the window operator never sees a
    * raw event; gaps in the hour axis are handled by the range frame,
    * which spans hour VALUES, not rows). This is the mergeability
    * argument of [[merge]] made into a queryable operator: per-bucket
    * max over any hour set IS the union sketch of those hours.
    *
    * The expansion step is load-bearing: each hourly register row is
    * EMITTED INTO every window it participates in (explode to the W
    * window-end hours, then a second register-wise max) — a range
    * window frame over the register table is the tempting wrong plan,
    * because it only produces rows at (hour, bucket) pairs the end
    * hour itself touched, silently DROPPING buckets whose users
    * appeared earlier in the window (caught by the accuracy spec:
    * a 4-user window estimated as 1). The explode multiplies the
    * SKETCH table by W, never the raw events; both groupBys carry
    * ≤ types × hours × 256 (× W) rows after map-side partial max.
    * Output: the merged register table per (type, window-end hour) —
    * window-ends past quiet hours still answer (the dashboard's
    * "last N h as of tick T" even when nothing happened at T).
    * Estimates derive via [[estimate]] (driver-side float, spec-bound
    * against exact trailing-window counts; never oracle-compared).
    */
  def sketchHllWindow(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_ms div 3600000").as("hour"),
        expr("graft_hash60(cast(user_id as string))").as("h"))
      .select(col("event_type"), col("hour"),
        expr(s"h % $HllBuckets").as("bucket"),
        expr(s"CASE WHEN h div $HllBuckets = 0 THEN $RhoMax " +
          s"ELSE $RhoMax - length(bin(h div $HllBuckets)) END").as("rho"))
      .groupBy("event_type", "hour", "bucket")
      .agg(max("rho").cast(LongType).as("max_rho"))
      .select(col("event_type"), col("bucket"), col("max_rho"),
        explode(expr(s"sequence(hour, hour + ${HllWindowHours - 1})")).as("hour"))
      .groupBy("event_type", "hour", "bucket")
      .agg(max("max_rho").cast(LongType).as("win_rho"))
      .orderBy("event_type", "hour", "bucket")
  }

  def sketchHllWindowSql: String = {
    val h = graft.functions.Portable.hash60Duck("CAST(user_id AS VARCHAR)")
    s"""WITH h AS (
       |  SELECT event_type, epoch_ms(ts) // 3600000 AS hour, $h AS h
       |  FROM events),
       |r AS (
       |  SELECT event_type, hour, h % $HllBuckets AS bucket,
       |    CAST(MAX(CASE WHEN h // $HllBuckets = 0 THEN $RhoMax
       |             ELSE $RhoMax - length(bin(h // $HllBuckets)) END) AS BIGINT) AS max_rho
       |  FROM h GROUP BY 1, 2, 3)
       |SELECT event_type, hour + o.k AS hour, bucket,
       |  CAST(MAX(max_rho) AS BIGINT) AS win_rho
       |FROM r, range(0, $HllWindowHours) o(k)
       |GROUP BY event_type, hour + o.k, bucket
       |ORDER BY event_type, hour, bucket""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_hll" -> (sketchHll _),
    "sketch_hll_window" -> (sketchHllWindow _),
    "sketch_kmv" -> (sketchKmv _),
    "sketch_set_ops" -> (sketchSetOps _),
    "sketch_topk" -> (sketchTopk _),
    "sketch_quantile" -> (sketchQuantile _),
    "sketch_cms" -> (sketchCms _),
    "sketch_cms_est" -> (sketchCmsEst _))

  def oracles: Map[String, String] = Map(
    "sketch_hll" -> sketchHllSql,
    "sketch_hll_window" -> sketchHllWindowSql,
    "sketch_kmv" -> sketchKmvSql,
    "sketch_set_ops" -> sketchSetOpsSql,
    "sketch_topk" -> sketchTopkSql,
    // the histogram form must reproduce the positional form exactly
    "sketch_quantile" -> Analytics.qPercentilesSql,
    "sketch_cms" -> sketchCmsSql,
    "sketch_cms_est" -> sketchCmsEstSql)
}
