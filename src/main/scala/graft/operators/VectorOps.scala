package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Similarity search + embedding near-dup over the `embeddings` table
  * (SURVEY.md §2: `ann_bruteforce` baseline, LSH-bucketed scale path).
  *
  * Oracle portability: float math never crosses the oracle. Embeddings
  * are quantized row-locally to integer lists (floor(x*1e4 + 0.5) —
  * identical double op on both engines), dot products and norms are
  * then EXACT integer sums (< 2^53, so even DuckDB's double
  * accumulation is exact), and the cosine score is derived from those
  * exact integers with deterministic IEEE ops (sqrt/mul/div), rendered
  * fixed-point e6. Ranking ties break by neighbor id.
  *
  * Scale posture: signatures and quantization are per-row (no
  * shuffle); `ann_bruteforce` is the small-corpus baseline (its
  * query-side is the bounded set at 100 TB — the corpus side streams);
  * `ann_lsh`/`dedup_embed` bound candidates by random-hyperplane
  * buckets so no cross join ever materializes.
  */
object VectorOps {

  private val Dim = 64
  private val Bands = 4
  private val BitsPerBand = 4
  // derived, never set independently: the oracle CTE iterates it and
  // the Spark path computes bands*bitsPerBand — one source of truth
  private val Planes = Bands * BitsPerBand

  /** Spark-side quantized vector: array<bigint>. */
  private val quantExpr =
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"

  private val quantDuck =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"

  /** Exact integer dot product via the native codegen expression
    * (graft.functions.LongDot — registered per session).
    */
  private def dotExpr(a: String, b: String): String = s"long_dot($a, $b)"

  /** DuckDB: double accumulation over ints < 2^53 is exact. */
  private def dotDuck(a: String, b: String): String =
    s"CAST(list_dot_product(list_transform($a, x -> CAST(x AS DOUBLE)), list_transform($b, x -> CAST(x AS DOUBLE))) AS BIGINT)"

  /** cosine * 1e6, fixed-point, from exact integer dot/norms. */
  private def scoreE6(dot: String, na2: String, nb2: String): String =
    s"CAST(floor($dot / (sqrt(CAST($na2 AS DOUBLE)) * sqrt(CAST($nb2 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)"

  /** Deterministic pseudo-random hyperplane j: 64 ints in [-1000, 1000]
    * derived from the portable md5 hash — both engines synthesize the
    * SAME planes, so bucketing is reproducible with no stored model.
    * Spark-side the whole plane matrix lives inside the native
    * `graft_lsh_buckets` expression (graft.functions.LshBuckets —
    * LshBuckets.planeComponent is this same recipe); only the DuckDB
    * rendering remains here.
    */
  private def planeDuck(j: Int): String =
    s"[CAST(CAST(CONCAT('0x', SUBSTRING(md5(CONCAT('$j', '_', CAST(i AS VARCHAR))),1,15)) AS UBIGINT) % 2001 AS BIGINT) - 1000 " +
      s"for i in range(0, $Dim)]"

  /** vectors + quantization + norm², all row-local. Zero-norm vectors
    * (all components quantize to 0) are dropped — cosine is undefined
    * for them, and NaN semantics differ between engines (Spark CAST
    * maps NaN to 0; DuckDB errors). The oracle applies the same guard.
    */
  private def quantized(spark: SparkSession, dir: String,
      spreadInput: Boolean = true): DataFrame =
    // materialized once: every consumer is a self-join or multi-read.
    // fan out before the row-local quantize+norm (§2.5 input skew —
    // the single-row-group embeddings scan is otherwise ONE task);
    // dedup_embed opts out (paired sf1 A/B: its band-vector self-join
    // measured worse over the 32-partition checkpoint, 3.10 -> 4.64)
    graft.Scratch.cp(quantizePlan(
      if (spreadInput) Tables.spread(Tables.embeddings(spark, dir), "vec_id")
      else Tables.embeddings(spark, dir)))

  private val quantizedDuckCte =
    s"""q0 AS (
       |  SELECT vec_id, $quantDuck AS q FROM embeddings),
       |qv AS (
       |  SELECT * FROM (
       |    SELECT vec_id, q, ${dotDuck("q", "q")} AS n2 FROM q0) t
       |  WHERE n2 > 0)""".stripMargin

  /** LSH bucket keys: per band, the sign bits of the hyperplane dot
    * products — row-local, then exploded to (band_idx, bucket).
    *
    * Band geometry is a SCALE knob: expected candidate pairs per band
    * are ~n²/2^bits, so the 4-bit default (pinned by the oracles at
    * test SF) is for small corpora — at 100 TB set bitsPerBand to
    * 16-24 (the md5-derived planes exist for any index, and the plan
    * shape is identical). Recall falls as bands narrow; compensate
    * with more bands.
    */
  private[graft] def bucketed(spark: SparkSession, dir: String,
      bands: Int = Bands, bitsPerBand: Int = BitsPerBand,
      keepBandVector: Boolean = false, spreadInput: Boolean = true): DataFrame =
    bucketedFrom(quantized(spark, dir, spreadInput), bands, bitsPerBand, keepBandVector)

  /** Bucket keys over a caller-supplied quantized frame
    * (vec_id, q, n2) — the corpus-independent entry the recall specs
    * drive with synthetic clustered vectors.
    */
  private[graft] def bucketedOf(qIn: DataFrame,
      bands: Int, bitsPerBand: Int,
      keepBandVector: Boolean = false): DataFrame =
    bucketedFrom(graft.Scratch.cp(qIn), bands, bitsPerBand, keepBandVector)

  private def bucketedFrom(q: DataFrame,
      bands: Int, bitsPerBand: Int, keepBandVector: Boolean): DataFrame =
    // materialized once: quantization + the hyperplane dots feed both
    // self-join sides of ann_lsh / dedup_embed; the quantized frame is
    // subsumed by this one and released immediately
    graft.Scratch.seal(bucketKeysPlan(q, bands, bitsPerBand, keepBandVector), q)

  /** The pure (vec_id, q, n2, band_idx, bucket) plan — every step
    * row-local, so it runs unchanged on a STREAMING frame (the
    * stream_ann probe side); the batch path seals it, a stream must
    * not.
    *
    * With `keepBandVector` each exploded row ALSO carries every
    * band's bucket as scalar columns `bb0..bb{bands-1}` — what lets
    * the self-join consumers assign each colliding pair to its FIRST
    * shared band with a row-local scalar check (see [[lshTopkFrom]])
    * instead of deduplicating the materialized candidate set.
    */
  private[graft] def bucketKeysPlan(q: DataFrame,
      bands: Int = Bands, bitsPerBand: Int = BitsPerBand,
      keepBandVector: Boolean = false): DataFrame = {
    // all bands in ONE native pass (graft.functions.LshBuckets): the
    // spelled-out form — bands*bits separate long_dot(q, <literal
    // plane>) bit columns — re-walked the vector per plane and was the
    // dominant constant of the production geometry (bands=8, bits=16:
    // 128 dots/row; the r11 knob table's 34.9 s vs 10.5 s gap).
    // Bucket values are bit-identical (LshBucketsSpec pins it), so the
    // gate oracles are untouched.
    // the EXPLODE shape is deliberately the pre-native one (scalar
    // bucket columns -> map_from_arrays -> explode): switching to
    // posexplode(_bkts) regressed the stream-static join of stream_ann
    // 1.6x at sf1 (7.2 -> 11.7 s isolated A/B) — only the per-plane
    // hashing moved into the native pass, the generator and join
    // planning see the exact plan shape they always did.
    GraftFunctions.register(q.sparkSession)
    val withBkts = q.withColumn("_bkts",
      expr(s"graft_lsh_buckets(q, $bands, $bitsPerBand)"))
    val withBuckets = (0 until bands).foldLeft(withBkts) { (d, b) =>
      d.withColumn(s"bucket$b", expr(s"_bkts[$b]"))
    }
    val carriedNames =
      if (keepBandVector) (0 until bands).map(b => s"bb$b") else Seq.empty
    val carried = carriedNames.zipWithIndex.map {
      case (n, b) => col(s"bucket$b").as(n)
    }
    withBuckets.select(Seq(col("vec_id"), col("q"), col("n2")) ++ carried :+
      explode(expr(s"map_from_arrays(sequence(0, ${bands - 1}), " +
        s"array(${(0 until bands).map(b => s"bucket$b").mkString(",")}))")): _*)
      .toDF(Seq("vec_id", "q", "n2") ++ carriedNames ++ Seq("band_idx", "bucket"): _*)
  }

  /** Row-local "this band owns the pair" predicate for the bucketed
    * self-joins: TRUE iff the joined band is the FIRST band where the
    * two rows' buckets collide. Each colliding pair then materializes
    * EXACTLY ONCE across the whole join — uniqueness by construction
    * replaces a distinct over the full candidate set (the largest
    * shuffle these operators had), and makes the per-query top-k
    * partial safe to run map-side. All-scalar comparisons (bands is
    * plan-time geometry), so the candidate stage stays inside
    * whole-stage codegen.
    */
  private def firstSharedBand(bands: Int): String =
    "CASE CAST(a.band_idx AS INT) WHEN 0 THEN true " +
      (1 until bands).map(j =>
        s"WHEN $j THEN " +
          (0 until j).map(i => s"a.bb$i <> b.bb$i").mkString(" AND "))
        .mkString(" ") + " END"

  /** Row-local quantization of a raw embeddings frame — shared by the
    * batch [[quantized]] path and the streaming probe side (which
    * cannot checkpoint). Zero-norm guard identical to the oracle's.
    */
  private[graft] def quantizePlan(raw: DataFrame): DataFrame = {
    GraftFunctions.register(raw.sparkSession)
    raw.withColumn("q", expr(quantExpr))
      .withColumn("n2", expr(dotExpr("q", "q")))
      .filter(col("n2") > 0)
      .select("vec_id", "q", "n2")
  }

  /** The streaming-ANN score expression (probe q vs indexed nq) —
    * one definition shared by stream and any batch cross-check.
    */
  private[graft] def streamAnnScore: String =
    scoreE6(dotExpr("q", "nq"), "n2", "nn2")

  /** stream_ann contract: probes = the vec_id % 10 == 7 arrivals, the
    * searched index = everything else (yesterday's index — the
    * arrivals are NOT in it yet, the same delta split
    * dedup_substring_inc streams). Top-[[StreamAnnK]] per probe by
    * (score desc, n_id).
    */
  private[graft] val StreamAnnK = 3

  def streamAnnSql: String =
    s"""WITH $quantizedDuckCte,
       |$bucketedDuckCte,
       |cands AS (
       |  SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS n_id,
       |    ${scoreE6(dotDuck("a.q", "b.q"), "a.n2", "b.n2")} AS score_e6
       |  FROM buckets a JOIN buckets b
       |    ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       |  WHERE a.vec_id % 10 = 7 AND b.vec_id % 10 <> 7)
       |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, n_id, score_e6 FROM (
       |  SELECT q_id, n_id, score_e6,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score_e6 DESC, n_id) AS rnk
       |  FROM cands) t
       |WHERE rnk <= $StreamAnnK ORDER BY q_id, rnk""".stripMargin

  private val bucketedDuckCte: String = {
    val bitCols = (0 until Planes).map(j =>
      s"CASE WHEN ${dotDuck("q", s"(${planeDuck(j)})")} >= 0 THEN 1 ELSE 0 END AS bit$j")
      .mkString(",\n    ")
    val bucketCols = (0 until Bands).map { b =>
      val bits = (0 until BitsPerBand)
        .map(k => s"(bit${b * BitsPerBand + k} << $k)").mkString(" + ")
      s"$bits AS bucket$b"
    }.mkString(",\n    ")
    val bandSelects = (0 until Bands).map(b =>
      s"SELECT vec_id, q, n2, $b AS band_idx, bucket$b AS bucket FROM bk").mkString("\n  UNION ALL ")
    s"""bits AS (
       |  SELECT vec_id, q, n2,
       |    $bitCols
       |  FROM qv),
       |bk AS (
       |  SELECT vec_id, q, n2,
       |    $bucketCols
       |  FROM bits),
       |buckets AS (
       |  $bandSelects)""".stripMargin
  }

  /** Bounded top-k-per-query shortlist over a candidate frame — the
    * shared consumer of [[graft.functions.TopKPairs]] (round 16,
    * verdict item 1). Replaces every `row_number() OVER (PARTITION BY
    * q_id ORDER BY score DESC, n_id) <= k` rank window in the ANN
    * family: same rows, same rank order (pinned by TopKSpec), but the
    * plan is HashAggregate(partial top-k per key, map-side) →
    * Exchange(keys) → HashAggregate(final) → generate — NO sort of
    * the candidate set anywhere. The window's per-partition sort of
    * the full candidate frame was the measured sf10 scale term
    * (505.5 s window vs 9.7 s hash-aggregate floor over the identical
    * 312 M-row ann_pq candidate set, PLANS.md r15 addendum); the
    * exchange now carries at most k slots per (key, map task).
    *
    * Downstream partitioning (the r13 respread lesson): the window's
    * q_id exchange is replaced by the groupBy's OWN hashpartitioning
    * over the same keys, so consumers that joined on q_id (the ann_pq
    * re-rank) inherit the same distribution they always did.
    *
    * Output: keys..., rnk (1-based bigint), n_id, <scoreName> — the
    * exact column set the windows produced.
    */
  private def topkPerQuery(cands: DataFrame, scoreName: String, k: Int,
      keys: Seq[String] = Seq("q_id")): DataFrame =
    cands.groupBy(keys.map(col): _*)
      .agg(graft.functions.TopKPairs.column(col(scoreName), col("n_id"), k).as("_tk"))
      .select(keys.map(col) :+ posexplode(col("_tk")).as(Seq("_r", "_s")): _*)
      .select(keys.map(col) ++ Seq(
        (col("_r") + 1).cast(LongType).as("rnk"),
        col("_s.id").as("n_id"),
        col("_s.score").as(scoreName)): _*)

  /** The brute-force contract: query side must be BOUNDED (the corpus
    * side streams). Enforced, not just documented — `annBruteforceFor`
    * refuses a query side above this ceiling instead of silently
    * planning an all-pairs join that only a toy corpus survives.
    */
  val MaxBruteforceQueries = 100000L

  /** Exact top-k cosine neighbors of each `queries` row within
    * `corpus`, brute force: the correctness baseline. The query-side
    * cardinality guard is one count over the (already materialized)
    * bounded side; past the ceiling the scale paths are `annLsh` /
    * `annIvf`.
    */
  def annBruteforceFor(queries: DataFrame, corpus: DataFrame, k: Int,
      maxQueries: Long = MaxBruteforceQueries): DataFrame = {
    // bounded probe: counting under a limit short-circuits once
    // maxQueries+1 rows exist, so an un-materialized over-ceiling
    // query side is rejected without ever being fully evaluated; a
    // ceiling too large for the limit operator falls back to the
    // exact count (clamping would make the guard vacuous there)
    val n =
      if (maxQueries < Int.MaxValue) queries.limit(maxQueries.toInt + 1).count()
      else queries.count()
    require(n <= maxQueries,
      s"graft-ann: brute-force query side has > $maxQueries rows; " +
        "an all-pairs scan at this size is not the intended plan — use annLsh/annIvf")
    val joined = queries.as("a").join(corpus.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
        expr(scoreE6(dotExpr("a.q", "b.q"), "a.n2", "b.n2")).as("score_e6"))
    topkPerQuery(joined, "score_e6", k)
  }

  /** The gate's bounded probe set: `vec_id < ProbeCutoff` is a
    * FIXED-SIZE query side at every corpus scale (the testdata id
    * spaces all start at 0, and the sf1 amplifier's copy offsets keep
    * copy 0's ids intact) — so the gate entry exercises the enforced
    * probes × corpus contract shape, LINEAR in the corpus, instead of
    * the full self-join that dominated the sf1 sweep (39%) and
    * exhausted DuckDB's spill disk. At sf0.01 the cut covers the whole
    * 500-vector corpus, so the gate's answer set is unchanged there.
    */
  val ProbeCutoff = 500L

  /** Gate entry: exact top-5 for the bounded probe set against the
    * whole corpus — the contract shape [[annBruteforceFor]] enforces.
    * The full self-join baseline is spec-pinned (PipelineOpsSpec
    * equivalence on the probe region) rather than gate-run.
    */
  def annBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    val topk = annBruteforceFor(v.filter(col("vec_id") < ProbeCutoff), v, 5)
    graft.Scratch.seal(topk, v).orderBy("q_id", "rnk")
  }

  def annBruteforceSql: String =
    s"""WITH $quantizedDuckCte
       |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, n_id, score_e6 FROM (
       |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
       |    ${scoreE6(dotDuck("a.q", "b.q"), "a.n2", "b.n2")} AS score_e6,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${scoreE6(dotDuck("a.q", "b.q"), "a.n2", "b.n2")} DESC, b.vec_id) AS rnk
       |  FROM (SELECT * FROM qv WHERE vec_id < $ProbeCutoff) a
       |  JOIN qv b ON a.vec_id <> b.vec_id) t
       |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** Approximate top-k via random-hyperplane LSH buckets: candidates
    * share a band bucket; local top-3. Approximate w.r.t. exact kNN,
    * but fully DETERMINISTIC (md5-derived planes, fixed-point scores,
    * id tie-breaks) — so it carries a full oracle reproducing the
    * bucketing AND the ranking, like dedup_embed.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    annLshWith(spark, dir, Bands, BitsPerBand)

  /** ann_lsh with explicit band geometry — the scale entry point (see
    * [[bucketed]]'s knob note). The default geometry keeps the full
    * oracle; other geometries are spec-checked against the exact
    * baseline's quality bound.
    */
  def annLshWith(spark: SparkSession, dir: String,
      bands: Int, bitsPerBand: Int, k: Int = 3): DataFrame =
    lshTopkFrom(bucketed(spark, dir, bands, bitsPerBand,
      keepBandVector = true), bands, k)

  /** ann_lsh over a caller-supplied quantized frame — used by the
    * recall-floor spec to compare against brute force on a controlled
    * corpus.
    */
  def annLshOf(qIn: DataFrame, bands: Int = Bands,
      bitsPerBand: Int = BitsPerBand, k: Int = 3): DataFrame =
    lshTopkFrom(bucketedOf(qIn, bands, bitsPerBand,
      keepBandVector = true), bands, k)

  /** Sub-bucket salt factor for the LSH candidate self-join — the
    * text-LSH salt-split (TextOps.minhashCandidatesSaltSplit) applied
    * to the vector join. At the default 4-bit band geometry every
    * band has only 16 buckets, so the join's effective parallelism is
    * bands×buckets with hot buckets owning quadratic work; salting
    * splits each bucket's pair space S ways (the neighbor side keyed
    * by hash(vec_id) % S, the query side replicated to all S salts —
    * each pair still meets on EXACTLY one salt, so the candidate set
    * is identical, spec-pinned). Cost: the replicated side scans S× —
    * rows-sized, never pairs-sized. At production 16-24-bit geometry
    * buckets are fine-grained and S can drop to 1.
    */
  private[graft] val LshSaltFactor = 4

  /** The salted, canonical-band candidate self-join shared by the
    * top-k path and the spec hook. Candidate pairs materialize once
    * each ([[firstSharedBand]] — the distinct this replaces shuffled
    * the WHOLE candidate set, the operator's largest exchange by
    * orders of magnitude), so the top-k window's partial rank-limit
    * runs map-side on the join output and the only
    * candidate-set-sized work left is the scoring projection itself.
    * `b` must carry the band vector. Pairs are emitted both ways
    * (=!=, not <) because the top-k consumer ranks per q_id; the
    * dedup pair stream (dedupEmbed) builds its own one-way join.
    */
  private def lshCandidateJoin(b: DataFrame, bands: Int): DataFrame = {
    // KNOWN-WINDOW guard: the banded frame is bands× its Generate
    // estimate, the replicated side bands×salt× — adjudicated-bounded
    // at shipped geometries, merge-pinned past the ceiling so a
    // future bands/salt bump cannot resurrect a size-blind broadcast
    val salted = KnownWindow.guard(
      b.withColumn("salt", pmod(hash(col("vec_id")), lit(LshSaltFactor))),
      bands.toLong)
    val replicated = KnownWindow.guard(
      b.withColumn("salt", explode(expr(s"sequence(0, ${LshSaltFactor - 1})"))),
      bands.toLong * LshSaltFactor)
    replicated.as("a").join(salted.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.salt") === col("b.salt") &&
        col("a.vec_id") =!= col("b.vec_id") &&
        expr(firstSharedBand(bands)))
  }

  /** The raw canonical-band candidate pair stream — spec hook for the
    * uniqueness/equivalence pin (no scoring, no top-k).
    */
  private[graft] def annLshCandidatesForSpec(b: DataFrame, bands: Int): DataFrame =
    lshCandidateJoin(b, bands)
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"))

  private def lshTopkFrom(b: DataFrame, bands: Int, k: Int): DataFrame =
    graft.Scratch.seal(lshTopkPlan(b, bands, k), b).orderBy("q_id", "rnk")

  /** The UNSEALED shortlist plan — also the spec hook for the
    * plan-shape pin (TopKSpec asserts: HashAggregate with a map-side
    * partial, no Window, no sort keyed on the score).
    */
  private[graft] def lshTopkPlan(b: DataFrame, bands: Int, k: Int): DataFrame = {
    val cands = lshCandidateJoin(b, bands)
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
        expr(scoreE6(dotExpr("a.q", "b.q"), "a.n2", "b.n2")).as("score_e6"))
    topkPerQuery(cands, "score_e6", k)
  }

  /** Embedding-cosine near-dup: LSH-bucket candidates, exact
    * fixed-point cosine >= 0.40 — pairs (a < b). The full oracle
    * reproduces bucketing AND scoring, so recall semantics are pinned,
    * not just row counts.
    */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    val b = bucketed(spark, dir, keepBandVector = true, spreadInput = false)
    // each pair from its first shared band only (firstSharedBand) —
    // no distinct over the pair set, same argument as lshTopkFrom
    val pairs = b.as("a").join(b.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id") &&
        expr(firstSharedBand(Bands)))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        expr(scoreE6(dotExpr("a.q", "b.q"), "a.n2", "b.n2")).as("score_e6"))
      .filter(col("score_e6") >= 400000)
    graft.Scratch.seal(pairs, b).orderBy("a_id", "b_id")
  }

  def annLshSql: String =
    s"""WITH $quantizedDuckCte,
       |$bucketedDuckCte,
       |cands AS (
       |  SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS n_id,
       |    ${scoreE6(dotDuck("a.q", "b.q"), "a.n2", "b.n2")} AS score_e6
       |  FROM buckets a JOIN buckets b
       |    ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       |   AND a.vec_id <> b.vec_id)
       |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, n_id, score_e6 FROM (
       |  SELECT q_id, n_id, score_e6,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score_e6 DESC, n_id) AS rnk
       |  FROM cands) t
       |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin

  def dedupEmbedSql: String =
    s"""WITH $quantizedDuckCte,
       |$bucketedDuckCte
       |SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
       |  ${scoreE6(dotDuck("a.q", "b.q"), "a.n2", "b.n2")} AS score_e6
       |FROM buckets a JOIN buckets b
       |  ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       | AND a.vec_id < b.vec_id
       |WHERE ${scoreE6(dotDuck("a.q", "b.q"), "a.n2", "b.n2")} >= 400000
       |ORDER BY a_id, b_id""".stripMargin

  /** IVF-style ANN: the second scale path. Vectors partition into C
    * coarse cells; queries probe their `nprobe` nearest cells and rank
    * only those candidates. Cells start from C deterministic seed
    * centroids (the first C vectors) and are refined by ONE Lloyd
    * step — broadcast seeds → assign every vector → per-cell
    * ELEMENT-WISE INTEGER MEAN as the new centroid — which keeps the
    * whole index oracle-expressible (integer sums are exact on both
    * engines, floor-of-mean is deterministic) while making the cells
    * data-adaptive instead of hostage to the first C rows. The
    * centroid table is broadcast (≤ C rows) at every stage; the
    * candidate join is cell-bounded, never n². At 100 TB the Lloyd
    * pass runs once per index build (its shuffle is rows×dim keyed by
    * (cell, dim) — linear, one pass) or on a sample; more iterations
    * compose the same step.
    */
  private val IvfCells = 16
  private val IvfProbes = 2
  /** gate geometry of the hierarchical routing arm (`ann_ivf_hier`):
    * 16 cells → S = ⌈√16⌉ = 4 super-centroids, 2 of them probed
    */
  private val IvfSuperProbes = 2

  /** Collect the ≤ `cells` centroid rows to the driver, cent_id
    * ascending. Bounded by construction like the PQ codebook: under
    * the cells ∝ √corpus sizing rule the coarse table is O(√n·dim) —
    * the serving-IVF contract that the coarse quantizer fits in
    * memory everywhere. It returns to the cluster as a BROADCAST
    * inside [[graft.functions.IvfRoute]], fetched once per executor.
    */
  private def collectCents(df: DataFrame): Array[(Long, Array[Long], Long)] =
    df.select("cent_id", "cq", "cn2").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      .sortBy(_._1)

  /** Seed centroids refined by `iters` Lloyd steps (0 = raw seeds),
    * collected. The ASSIGNMENT half of each step is row-local native
    * routing (ivf_route, probes=1) — the r12 verdict's scale-killer
    * was this very step as a crossJoin: n×cells rows through a
    * rank-per-vector window exchange, 1034 s at sf10/cells=1024. The
    * MEAN half keeps the distributed (cell, dim)-keyed aggregation:
    * map-side partials shrink its shuffle to cells×dim rows per
    * partition, and the refined table collected back is the same
    * ≤ cells rows the old DataFrame path broadcast.
    */
  private[graft] def refinedCentroidsRouted(v: DataFrame, cells: Int, iters: Int,
      superProbes: Int): Array[(Long, Array[Long], Long)] = {
    val sc = v.sparkSession.sparkContext
    var cents = collectCents(
      v.filter(col("vec_id") < cells)
        .select(col("vec_id").as("cent_id"), col("q").as("cq"), col("n2").as("cn2")))
    for (_ <- 0 until iters) {
      val bc = sc.broadcast(graft.functions.IvfCoarseIndex.build(cents, Dim))
      val refined = v
        .withColumn("cent_id", element_at(
          graft.functions.IvfRoute.column(col("q"), col("n2"), bc, 1, superProbes), 1))
        .select(col("cent_id"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy("cent_id", "pos")
        .agg(expr("CAST(FLOOR(SUM(x) / COUNT(*)) AS BIGINT)").as("m"))
        .groupBy("cent_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cq"))
        .withColumn("cn2", expr(dotExpr("cq", "cq")))
        .filter(col("cn2") > 0)
      cents = collectCents(refined)
      bc.destroy()
    }
    cents
  }

  /** One pass: top-`probes` cells per vector against the refined
    * centroids, materialized — the corpus side is the crnk=1 filter of
    * the SAME frame (computing assignments separately per side would
    * re-run the routing twice). Row-local: the only rows ever
    * materialized are the n×probes output of the native route —
    * versus the old n×cells scored crossJoin plus its window
    * exchange. `superProbes` <= 0 scans all cells (flat — the gate
    * oracle's geometry); > 0 routes hierarchically (production).
    */
  private[graft] def cellAssignmentsOf(v: DataFrame,
      cells: Int, probes: Int, lloydIters: Int, superProbes: Int): DataFrame = {
    val cents = refinedCentroidsRouted(v, cells, lloydIters, superProbes)
    val bc = v.sparkSession.sparkContext
      .broadcast(graft.functions.IvfCoarseIndex.build(cents, Dim))
    // RE-SPREAD before sealing — the stream_ann lesson, relearned on
    // this very operator: the old rank window exchanged the frame to
    // hashpartitioning(vec_id, 32), and the row-local route silently
    // dropped that exchange (posexplode inherits the embeddings
    // scan's 1-2 input splits at bench scale). Every downstream
    // consumer then shuffled FROM 1-2 map tasks and the candidate
    // stage's quadratic pair scoring near-serialized — ann_ivf read
    // 131.7 s at sf1 vs 7.95 pre-change while ann_pq (whose index
    // write re-spreads anyway) held. One n×probes-row exchange
    // restores the pre-native plan shape; it is strictly smaller
    // than the n×cells window exchange it replaces.
    val parallelism = v.sparkSession.sessionState.conf.numShufflePartitions
    val routed = v.select(col("vec_id"), col("q"), col("n2"),
        posexplode(graft.functions.IvfRoute.column(col("q"), col("n2"), bc, probes, superProbes))
          .as(Seq("crnk0", "cent_id")))
      .select(col("vec_id"), col("q"), col("n2"), col("cent_id"),
        (col("crnk0") + 1).as("crnk"))
      .repartition(parallelism, col("vec_id"))
    // subsumes the quantized frame (assignment rows carry q, n2);
    // seal materializes eagerly, so the broadcast can drop right after
    val out = graft.Scratch.seal(routed, v)
    bc.destroy()
    out
  }

  /** The pre-native assignment — `vectors CROSS JOIN
    * broadcast(centroids)` scored through a rank-per-vector window —
    * kept ONLY as the parity reference: IvfRouteParitySpec pins the
    * routed path row-identical to this plan at both gate geometries.
    * Never on the production path (n×cells rows + a window exchange).
    */
  private[graft] def cellAssignmentsDeclarative(v: DataFrame,
      cells: Int, probes: Int, lloydIters: Int): DataFrame = {
    var cents = v.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"), col("n2").as("cn2"))
    for (_ <- 0 until lloydIters) {
      val scored = v.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("q"), col("cent_id"),
          expr(scoreE6(dotExpr("q", "cq"), "n2", "cn2")).as("cscore"))
      val w = Window.partitionBy("vec_id").orderBy(col("cscore").desc, col("cent_id"))
      val assign = scored.withColumn("crnk", row_number().over(w))
        .filter(col("crnk") === 1)
      cents = assign
        .select(col("cent_id"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy("cent_id", "pos")
        .agg(expr("CAST(FLOOR(SUM(x) / COUNT(*)) AS BIGINT)").as("m"))
        .groupBy("cent_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cq"))
        .withColumn("cn2", expr(dotExpr("cq", "cq")))
        .filter(col("cn2") > 0)
    }
    val scored = v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"), col("n2"), col("cent_id"),
        expr(scoreE6(dotExpr("q", "cq"), "n2", "cn2")).as("cscore"))
    val w = Window.partitionBy("vec_id").orderBy(col("cscore").desc, col("cent_id"))
    graft.Scratch.seal(
      scored.withColumn("crnk", row_number().over(w))
        .filter(col("crnk") <= probes)
        .drop("cscore"),
      v)
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    annIvfWith(spark, dir, IvfCells, IvfProbes)

  /** The hierarchical-routing arm at gate geometry, with its OWN full
    * DuckDB oracle ([[annIvfHierSql]] re-derives super seeds → group
    * assignment → two-stage probe in SQL) — so the production routing
    * path is hash-pinned end-to-end, not just spec-compared. Same
    * cells/probes as `ann_ivf`; only the routing differs.
    */
  def annIvfHier(spark: SparkSession, dir: String): DataFrame =
    annIvfWith(spark, dir, IvfCells, IvfProbes, superProbes = IvfSuperProbes)

  /** Production IVF geometry, gate-carried (round-15 verdict item 1,
    * the `dedup_simhash_prod` precedent): cells = ⌈√n⌉ over the
    * zero-norm-filtered corpus — the sizing rule that keeps per-cell
    * posting lists AND the broadcast coarse index both O(√n), so
    * neither side outgrows an executor as the corpus scales — with
    * probes = 2 and superProbes = 6 (the smallest sf1-measured point
    * holding the flat router's recall@3 = 1.00, PLANS.md r13 table).
    * The sf10 headline row times THIS plan; the fixed-16-cell
    * `ann_ivf` gate entry stays for the dense-geometry oracle but is
    * retired from the sf10 sweep (its 900+ s rows were measuring the
    * intentionally-quadratic small-corpus setting, r14 verdict).
    * Both engines derive cells from the same COUNT: ⌈√n⌉ is exact in
    * IEEE for any corpus size in range.
    */
  private[graft] val ProdIvfProbes = 2
  private[graft] val ProdIvfSuperProbes = 6

  def annIvfProd(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    val cells = math.ceil(math.sqrt(v.count().toDouble)).toInt
    annIvfOf(v, cells, ProdIvfProbes, 3, 1, ProdIvfSuperProbes)
  }

  def annIvfProdSql: String = annIvfHierSqlWith(
    "(SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) FROM qv)",
    ProdIvfProbes, ProdIvfSuperProbes)

  /** ann_ivf with explicit cell/probe counts — the scale knob (cells
    * grows with corpus size so each cell's slice stays
    * executor-sized; recall tunes with probes and Lloyd iterations).
    * The default geometry keeps the full oracle; the centroid side
    * is one broadcast coarse index of `cells` rows.
    *
    * `superProbes` selects the routing: 0 = flat scan of all cells
    * (the gate oracle's geometry — still row-local native, but
    * n·cells dot products); > 0 = hierarchical, n·(√cells +
    * superProbes·√cells) — the PRODUCTION setting once cells grows
    * with the corpus (cells ∝ corpus makes flat assignment the n²
    * term the r12 sf10 sweep measured at 1034 s). PRODUCTION
    * superProbes = 6: the smallest sf1-measured point holding the
    * flat router's recall@3 = 1.00 (PLANS.md round-13 table;
    * superProbes 2 and 4 read 0.99).
    */
  def annIvfWith(spark: SparkSession, dir: String,
      cells: Int, probes: Int, k: Int = 3, lloydIters: Int = 1,
      superProbes: Int = 0): DataFrame =
    annIvfOf(quantized(spark, dir), cells, probes, k, lloydIters, superProbes)

  /** ann_ivf over an externally supplied quantized frame (vec_id, q,
    * n2) — consumed (and released) by this call; the recall spec feeds
    * synthetic clustered corpora through it.
    */
  def annIvfOf(v: DataFrame,
      cells: Int, probes: Int, k: Int, lloydIters: Int,
      superProbes: Int = 0): DataFrame = {
    val assigned = cellAssignmentsOf(v, cells, probes, lloydIters, superProbes)
    // salt-split the cell join (the ann_lsh pattern): with few coarse
    // cells the join's parallelism is the cell count and a hot cell
    // owns quadratic work — the corpus side salts by hash(n_id), the
    // probe side replicates to all salts, every pair still meets on
    // exactly one salt (n_id determines it), so the candidate set is
    // unchanged and spread over cells×S keys
    val corpus = assigned.filter(col("crnk") === 1)
      .select(col("vec_id").as("n_id"), col("q").as("nq"), col("n2").as("nn2"),
        col("cent_id").as("cell"))
      .withColumn("salt", pmod(hash(col("n_id")), lit(LshSaltFactor)))
    // guard factor = the salt explode ONLY: `assigned` is sealed
    // (checkpointed), so its probes-fold replication is already in
    // the planner's real stats — including probes here overstated the
    // underestimate probes× and would merge-pin unrepresentative
    // geometries in a probes-swept run (r16 ADVICE)
    val queriesSide = KnownWindow.guard(
      assigned
        .select(col("vec_id").as("q_id"), col("q").as("qq"), col("n2").as("qn2"),
          col("cent_id").as("cell"))
        .withColumn("salt", explode(expr(s"sequence(0, ${LshSaltFactor - 1})"))),
      LshSaltFactor.toLong)
    // no distinct: each n_id lives in exactly one cell (crnk = 1) and
    // a query probes distinct cells, so (q_id, n_id) pairs are unique
    // by construction — a distinct would re-shuffle the full
    // candidate set for nothing (uniqueness spec-pinned with ann_pq's)
    val cands = queriesSide.join(corpus, Seq("cell", "salt"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        expr(scoreE6(dotExpr("qq", "nq"), "qn2", "nn2")).as("score_e6"))
    graft.Scratch.seal(topkPerQuery(cands, "score_e6", k), assigned)
      .orderBy("q_id", "rnk")
  }

  def annIvfSql: String =
    s"""WITH $quantizedDuckCte,
       |seeds AS (
       |  SELECT vec_id AS cent_id, q AS cq, n2 AS cn2 FROM qv WHERE vec_id < $IvfCells),
       |sassign AS (
       |  SELECT vec_id, q, cent_id FROM (
       |    SELECT v.vec_id, v.q, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${scoreE6(dotDuck("v.q", "c.cq"), "v.n2", "c.cn2")} DESC, c.cent_id) AS crnk
       |    FROM qv v CROSS JOIN seeds c) t
       |  WHERE crnk = 1),
       |rm AS (
       |  SELECT cent_id, p.pos AS pos,
       |    CAST(FLOOR(SUM(q[p.pos + 1]) / COUNT(*)) AS BIGINT) AS m
       |  FROM sassign, range(0, $Dim) p(pos)
       |  GROUP BY cent_id, p.pos),
       |cents0 AS (
       |  SELECT cent_id, list(m ORDER BY pos) AS cq FROM rm GROUP BY cent_id),
       |cents AS (
       |  SELECT * FROM (
       |    SELECT cent_id, cq, ${dotDuck("cq", "cq")} AS cn2 FROM cents0) t
       |  WHERE cn2 > 0),
       |assign AS (
       |  SELECT v.vec_id, v.q, v.n2, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${scoreE6(dotDuck("v.q", "c.cq"), "v.n2", "c.cn2")} DESC, c.cent_id) AS crnk
       |  FROM qv v CROSS JOIN cents c),
       |corpus AS (
       |  SELECT vec_id AS n_id, q AS nq, n2 AS nn2, cent_id AS cell
       |  FROM assign WHERE crnk = 1),
       |queries AS (
       |  SELECT vec_id AS q_id, q AS qq, n2 AS qn2, cent_id AS cell
       |  FROM assign WHERE crnk <= $IvfProbes),
       |cands AS (
       |  SELECT DISTINCT q_id, n_id,
       |    ${scoreE6(dotDuck("qq", "nq"), "qn2", "nn2")} AS score_e6
       |  FROM queries JOIN corpus USING (cell)
       |  WHERE q_id <> n_id)
       |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, n_id, score_e6 FROM (
       |  SELECT q_id, n_id, score_e6,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score_e6 DESC, n_id) AS rnk
       |  FROM cands) t
       |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin

  /** The hierarchical oracle re-derives the ENTIRE routed pipeline in
    * SQL — super seeds (first ⌈√C⌉ centroids by cent_id), each
    * centroid's group (rank-1 against the super seeds), per-vector
    * super routing (top-`superProbes`), and the within-route cell
    * ranking — at BOTH stages (the Lloyd assignment and the final
    * probe), exactly what [[graft.functions.IvfCoarseIndex.route]]
    * computes row-locally. Every ranking is (score_e6 DESC, cent_id
    * ASC), every score the shared fixed-point cosine.
    *
    * PARAMETRIC (round 15, the dedup_simhash_prod precedent): one
    * template renders the gate geometry (`ann_ivf_hier`) AND the
    * production geometry (`ann_ivf_prod`) — `cellsSql` is any scalar
    * SQL expression, so the production arm's cells ∝ √corpus rule
    * renders as a subquery over the corpus itself.
    */
  def annIvfHierSql: String =
    annIvfHierSqlWith(IvfCells.toString, IvfProbes, IvfSuperProbes)

  def annIvfHierSqlWith(cellsSql: String, probes: Int, superProbes: Int): String =
    s"""WITH $quantizedDuckCte,
       |seeds AS (
       |  SELECT vec_id AS cent_id, q AS cq, n2 AS cn2 FROM qv WHERE vec_id < $cellsSql),
       |sseed AS (
       |  SELECT cent_id, cq, cn2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (ORDER BY cent_id) AS rs FROM seeds) t
       |  WHERE rs <= CEIL(SQRT((SELECT COUNT(*) FROM seeds)))),
       |s2s AS (
       |  SELECT cent_id, sid FROM (
       |    SELECT c.cent_id, s.cent_id AS sid,
       |      ROW_NUMBER() OVER (PARTITION BY c.cent_id
       |        ORDER BY ${scoreE6(dotDuck("c.cq", "s.cq"), "c.cn2", "s.cn2")} DESC, s.cent_id) AS r
       |    FROM seeds c CROSS JOIN sseed s) t WHERE r = 1),
       |vroute AS (
       |  SELECT vec_id, sid FROM (
       |    SELECT v.vec_id, s.cent_id AS sid,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${scoreE6(dotDuck("v.q", "s.cq"), "v.n2", "s.cn2")} DESC, s.cent_id) AS r
       |    FROM qv v CROSS JOIN sseed s) t WHERE r <= $superProbes),
       |sassign AS (
       |  SELECT vec_id, q, cent_id FROM (
       |    SELECT v.vec_id, v.q, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${scoreE6(dotDuck("v.q", "c.cq"), "v.n2", "c.cn2")} DESC, c.cent_id) AS crnk
       |    FROM qv v JOIN vroute r ON r.vec_id = v.vec_id
       |      JOIN s2s m ON m.sid = r.sid
       |      JOIN seeds c ON c.cent_id = m.cent_id) t
       |  WHERE crnk = 1),
       |rm AS (
       |  SELECT cent_id, p.pos AS pos,
       |    CAST(FLOOR(SUM(q[p.pos + 1]) / COUNT(*)) AS BIGINT) AS m
       |  FROM sassign, range(0, $Dim) p(pos)
       |  GROUP BY cent_id, p.pos),
       |cents0 AS (
       |  SELECT cent_id, list(m ORDER BY pos) AS cq FROM rm GROUP BY cent_id),
       |cents AS (
       |  SELECT * FROM (
       |    SELECT cent_id, cq, ${dotDuck("cq", "cq")} AS cn2 FROM cents0) t
       |  WHERE cn2 > 0),
       |csseed AS (
       |  SELECT cent_id, cq, cn2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (ORDER BY cent_id) AS rs FROM cents) t
       |  WHERE rs <= CEIL(SQRT((SELECT COUNT(*) FROM cents)))),
       |c2s AS (
       |  SELECT cent_id, sid FROM (
       |    SELECT c.cent_id, s.cent_id AS sid,
       |      ROW_NUMBER() OVER (PARTITION BY c.cent_id
       |        ORDER BY ${scoreE6(dotDuck("c.cq", "s.cq"), "c.cn2", "s.cn2")} DESC, s.cent_id) AS r
       |    FROM cents c CROSS JOIN csseed s) t WHERE r = 1),
       |qroute AS (
       |  SELECT vec_id, sid FROM (
       |    SELECT v.vec_id, s.cent_id AS sid,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${scoreE6(dotDuck("v.q", "s.cq"), "v.n2", "s.cn2")} DESC, s.cent_id) AS r
       |    FROM qv v CROSS JOIN csseed s) t WHERE r <= $superProbes),
       |assign AS (
       |  SELECT v.vec_id, v.q, v.n2, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${scoreE6(dotDuck("v.q", "c.cq"), "v.n2", "c.cn2")} DESC, c.cent_id) AS crnk
       |  FROM qv v JOIN qroute r ON r.vec_id = v.vec_id
       |    JOIN c2s m ON m.sid = r.sid
       |    JOIN cents c ON c.cent_id = m.cent_id),
       |corpus AS (
       |  SELECT vec_id AS n_id, q AS nq, n2 AS nn2, cent_id AS cell
       |  FROM assign WHERE crnk = 1),
       |queries AS (
       |  SELECT vec_id AS q_id, q AS qq, n2 AS qn2, cent_id AS cell
       |  FROM assign WHERE crnk <= $probes),
       |cands AS (
       |  SELECT DISTINCT q_id, n_id,
       |    ${scoreE6(dotDuck("qq", "nq"), "qn2", "nn2")} AS score_e6
       |  FROM queries JOIN corpus USING (cell)
       |  WHERE q_id <> n_id)
       |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, n_id, score_e6 FROM (
       |  SELECT q_id, n_id, score_e6,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score_e6 DESC, n_id) AS rnk
       |  FROM cands) t
       |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin

  // ----------------------------------------------------------------
  // ann_pq — IVF-PQ: the memory-bound scale path. The IVF cells bound
  // the CANDIDATE count (as ann_ivf); product quantization bounds the
  // INDEX size — each corpus vector is stored as PqSub code ids
  // (bytes at production K) instead of Dim quantized components, and
  // candidate scoring is PqSub table lookups (ADC) instead of a
  // Dim-wide dot product. The per-subspace codebooks are trained by
  // the same deterministic integer-space Lloyd step ann_ivf uses
  // (seed rows → assign by exact integer L2² → floor-of-mean), so the
  // WHOLE index — training included — stays oracle-expressible.
  //
  // Scale posture: the codebook is M×K rows BY CONSTRUCTION
  // (constants, independent of corpus size) — the one frame collected
  // to the driver, same bounded-dim contract as the tenant registry.
  // Training and encoding are one linear pass each (row-local argmin
  // against literal codebooks; the Lloyd mean shuffles rows×M keyed by
  // (m, code, pos) — linear, one pass). The candidate join shuffles
  // (cell, codes[M], rn2) on the corpus side — never the vectors.
  // The ADC trade is explicit: the query side carries an M×K lookup
  // table per probe row (classic ADC — amortized when corpus ≫
  // queries, which is the ANN contract at 100 TB).
  // ----------------------------------------------------------------

  private[graft] val PqSub = 8 // M subquantizers
  private[graft] val PqSubDim = Dim / PqSub
  private[graft] val PqCodes = 16 // K codes per subquantizer

  /** Driver-held codebook: m -> (code -> codeword), codes ascending.
    * ≤ M×K entries by construction — a bounded dim, never data-scaled.
    */
  private[graft] type PqCodebook = Map[Int, Seq[(Long, Seq[Long])]]

  private[graft] def pqSeedsOf(base: DataFrame, subDim: Int, nSub: Int, nCodes: Int): PqCodebook = {
    val rows = base.filter(col("vec_id") < nCodes)
      .select("vec_id", "q").collect()
    (0 until nSub).map { m =>
      m -> rows.map { r =>
        val q = r.getSeq[Long](1)
        (r.getLong(0), q.slice(m * subDim, (m + 1) * subDim))
      }.sortBy(_._1).toSeq
    }.toMap
  }

  /** Row-local argmin over the literal codebook for subspace `m`,
    * applied to the subvector expression `sv`: minimizes the exact
    * integer L2² — the ‖sv‖² term is constant across codes, so the
    * comparison key is (cn2 - 2·dot), which orders (and ties)
    * identically to the oracle's full `ORDER BY dist, code`;
    * first-minimum position = lowest code id.
    */
  private[graft] def pqArgminExpr(cb: PqCodebook, m: Int, sv: String): String = {
    val entries = cb(m)
    val dists = entries.map { case (_, cq) =>
      val lit = cq.map(_ + "L").mkString("array(", ", ", ")")
      val cn2 = cq.map(x => x * x).sum
      s"(${cn2}L - 2 * ${dotExpr(sv, lit)})"
    }.mkString("array(", ", ", ")")
    val ids = entries.map(_._1 + "L").mkString("array(", ", ", ")")
    s"element_at($ids, CAST(array_position($dists, array_min($dists)) AS INT))"
  }

  /** codes[M] for a corpus row — one row-local expression, no join.
    *
    * LITERAL formulation, retained for the parity spec only (the
    * production path is the broadcast-codebook native
    * [[graft.functions.PqEncode]]): spelling M×K codeword dot
    * products into the SQL is K-quadratic in plan size — 5.3 MiB task
    * binaries at the production K=256, past the 64 KB whole-stage-
    * codegen method limit, 1719 s at sf10 (r13 verdict item 1).
    */
  private[graft] def pqCodesExpr(cb: PqCodebook, nSub: Int, subDim: Int): String =
    (0 until nSub)
      .map(m => pqArgminExpr(cb, m, s"slice(q, ${m * subDim + 1}, $subDim)"))
      .mkString("array(", ", ", ")")

  /** One distributed Lloyd step: assign every subvector row-locally
    * against the literal codebook, then per-(m, code, pos)
    * floor-of-mean — the identical integer-space refinement the IVF
    * centroids use. Only the refined ≤ M×K codebook returns to the
    * driver. Codes that lose every member drop out (as the oracle's
    * mean-group does).
    */
  private[graft] def pqLloydStep(base: DataFrame, cb: PqCodebook,
      nSub: Int, subDim: Int, nCodes: Int): PqCodebook = {
    // assignment is native against the broadcast codebook
    // (pq_sub_assign — the IvfRoute pattern); the literal CASE-per-m
    // argmin chain it replaces is kept in pqArgminExpr for the parity
    // spec. Same generator, same downstream plan — only the
    // expression changed (the r12/r13 plan-shape lesson).
    val bc = base.sparkSession.sparkContext
      .broadcast(graft.functions.PqBook.build(cb, nSub, subDim, nCodes))
    val rows = base
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${nSub - 1}, 1), m -> slice(q, m * $subDim + 1, $subDim))"))
        .as(Seq("m", "sq")))
      .withColumn("code", graft.functions.PqExprs.subAssign(col("m"), col("sq"), bc))
      .select(col("m"), col("code"), posexplode(col("sq")).as(Seq("pos", "x")))
      .groupBy("m", "code", "pos")
      .agg(expr("CAST(FLOOR(SUM(x) / COUNT(*)) AS BIGINT)").as("cm"))
      .groupBy("m", "code")
      .agg(expr("transform(array_sort(collect_list(struct(pos, cm))), s -> s.cm)").as("cq"))
      .collect()
    bc.destroy()
    rows.map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3.toSeq)).sortBy(_._1).toSeq)
      .toMap
  }

  /** Flat M×K literal of per-(m, code) values; holes (dropped codes)
    * fill with 0 and are never dereferenced — encode only ever picks
    * surviving codes.
    */
  private[graft] def pqFlatLit(cb: PqCodebook, nSub: Int, nCodes: Int)(
      f: Seq[Long] => Long): String =
    (0 until nSub).flatMap { m =>
      val byCode = cb(m).toMap
      (0 until nCodes).map(k => byCode.get(k.toLong).map(f).getOrElse(0L))
    }.map(_ + "L").mkString("array(", ", ", ")")

  /** The query side's ADC table: adc[m*K + k] = dot(q_m, codeword).
    * LITERAL formulation, parity-spec-retained — production is the
    * native [[graft.functions.PqAdcTable]] (see pqCodesExpr's note).
    */
  private[graft] def pqAdcExpr(cb: PqCodebook, nSub: Int, subDim: Int, nCodes: Int): String =
    (0 until nSub).flatMap { m =>
      val byCode = cb(m).toMap
      val sq = s"slice(q, ${m * subDim + 1}, $subDim)"
      (0 until nCodes).map { k =>
        byCode.get(k.toLong) match {
          case Some(cq) =>
            dotExpr(sq, cq.map(_ + "L").mkString("array(", ", ", ")"))
          case None => "CAST(0 AS BIGINT)"
        }
      }
    }.mkString("array(", ", ", ")")

  /** ADC dot: Σ_m adc[m*K + codes[m]] — exactly dot(q, reconstructed)
    * because the subspaces partition the dimensions (integer sums,
    * no rounding anywhere), which is what the oracle computes via
    * explicit reconstruction.
    */
  /** Native gather-sum (graft.functions.AdcDot) — runs once per
    * (query, candidate) shortlist row, the hottest expression in
    * ann_pq. The declarative form it replaced stays below for the
    * parity spec.
    */
  private def pqAdcDot(adc: String, codes: String, nSub: Int, nCodes: Int): String =
    s"graft_adc_dot($adc, $codes, $nCodes)"

  private[graft] def pqAdcDotDeclarative(adc: String, codes: String,
      nSub: Int, nCodes: Int): String =
    s"aggregate(sequence(0, ${nSub - 1}, 1), CAST(0 AS BIGINT), (acc, m) -> " +
      s"acc + element_at($adc, m * $nCodes + CAST(element_at($codes, m + 1) AS INT) + 1))"

  /** ADC shortlist size per query before the exact re-rank — the
    * recall/IO knob: the store is read back for R candidate ids per
    * query, never for the corpus.
    */
  private[graft] val PqRerank = 10

  def annPq(spark: SparkSession, dir: String): DataFrame =
    annPqOf(quantized(spark, dir), IvfCells, IvfProbes, 3, 1, 1)

  /** IVF-PQ over a caller-supplied quantized frame — the recall spec's
    * entry point (synthetic clustered corpora). Consumes `v`.
    */
  def annPqOf(v: DataFrame, cells: Int, probes: Int, k: Int,
      lloydIters: Int, pqIters: Int,
      nSub: Int = PqSub, nCodes: Int = PqCodes,
      superProbes: Int = 0): DataFrame = {
    val parts = annPqPlan(v, cells, probes, k, lloydIters, pqIters, nSub, nCodes,
      superProbes)
    try graft.Scratch.seal(parts.topk, parts.assigned).orderBy("q_id", "rnk")
    finally parts.dropIndex()
  }

  /** The pieces of the IVF-PQ plan a consumer may need separately:
    * the final top-k, the materialized assignment frame (caller
    * releases), the bucketed codes-index read, and the index table's
    * cleanup hook (call after the result is materialized).
    */
  private[graft] case class PqPlanParts(topk: DataFrame, assigned: DataFrame,
      index: DataFrame, indexTable: String,
      book: org.apache.spark.broadcast.Broadcast[graft.functions.PqBook]) {
    def dropIndex(): Unit = {
      index.sparkSession.sql(s"DROP TABLE IF EXISTS $indexTable")
      // the ADC side references the broadcast codebook until the topk
      // frame materializes; callers drop the index (and with it the
      // book) only after that point
      book.destroy()
    }
  }

  /** The un-sealed IVF-PQ plan — the spec asserts the index's
    * codes-only schema (the corpus side of the candidate join must
    * never carry vectors) and the bucket-layout probe (the corpus
    * side of the candidate join must plan with no exchange).
    *
    * The codes index is a WRITE-side artifact: it is persisted as a
    * parquet table bucketed+sorted on `cell`, so its one shuffle is
    * paid at write time and every probe against it — this run's and,
    * at production, every later query batch's — scans
    * pre-partitioned files and joins exchange-free on the corpus
    * side. Only the (small, query-batch-sized) ADC side shuffles to
    * the bucket layout. Bucket count = IvfCells: the join's effective
    * parallelism is bounded by distinct cells whatever the partition
    * count, and one bucket file per cell is exactly the
    * one-posting-list-per-cell layout a serving IVF index uses.
    */
  private[graft] def annPqPlan(v: DataFrame, cells: Int, probes: Int, k: Int,
      lloydIters: Int, pqIters: Int,
      nSub: Int, nCodes: Int, superProbes: Int = 0,
      scoreRep: String = PqDefaultScoreRep): PqPlanParts = {
    val subDim = Dim / nSub
    val assigned = cellAssignmentsOf(v, cells, probes, lloydIters, superProbes)
    val base = assigned.filter(col("crnk") === 1)
    var cb = pqSeedsOf(base, subDim, nSub, nCodes)
    for (_ <- 0 until pqIters) cb = pqLloydStep(base, cb, nSub, subDim, nCodes)
    // the trained codebook ships as ONE broadcast consumed by native
    // codegen on both sides (encode/rn2 on the index write, ADC table
    // on the probe side) — O(M·K·subDim) longs fetched once per
    // executor, vs the literal-SQL formulation's 5.3 MiB task
    // binaries and codegen fallback at K=256 (r13 verdict item 1)
    val book = v.sparkSession.sparkContext
      .broadcast(graft.functions.PqBook.build(cb, nSub, subDim, nCodes))
    val table = "graft_pqidx_" + java.util.UUID.randomUUID().toString.replace("-", "")
    graft.sources.BucketedTable.write(
      pqIndexOf(base, book), table, "cell", cells)
    val corpus = graft.sources.BucketedTable.read(v.sparkSession, table)
    val (_, _, topk) = annPqProbeFrames(assigned, corpus, book,
      cells, probes, k, nSub, nCodes, scoreRep)
    PqPlanParts(topk, assigned, corpus, table, book)
  }

  /** Default ADC-scoring representation: DIRECT per-candidate dots
    * against the broadcast codebook (no per-probe-row M×K table) —
    * chosen by the r15 stage A/B, which confirmed the r14 verdict's
    * suspect: at sf1 production geometry (K=256, cells=128, hier) the
    * probe stage measured join-only 1.8 s / direct-scored 2.1 s /
    * table-scored 99.4 s — the M×K-per-row table build plus its
    * 16 KB/row payload through the join sort WAS the probe stage
    * (full probe 3.0 s direct vs 95.7 s table). The classic table
    * amortizes its M·K·subDim build over a cell's posting list, which
    * only pays when posting lists ≫ K; every sizing this library
    * ships (cells ∝ √corpus, K=256) keeps posting lists of the same
    * order as K. "adc" stays for the parity spec.
    *
    * The sf10 record does NOT repeat the sf1 margin (r15 ADVICE): the
    * r15 KNOBS_sf10.md A/B at the swept production geometry read full
    * probe 221.5 s (adc) vs 260.1 s (direct) — the reps within each
    * other's documented ±40-75% sweep-residue band, and BOTH numbers
    * dominated by the shortlist rank window (236.9 s of the probe),
    * not by scoring. Direct keeps the default on the sf1-scale win
    * plus its structurally thinner memory (no 16 KB/row tables through
    * the exchange); with the r16 window→aggregate fix the scoring term
    * is the probe again, so the r16 chain re-draws the rep A/B against
    * the new plan before this note is allowed to claim an sf10 winner.
    */
  private[graft] val PqDefaultScoreRep = "direct"

  /** The probe half of the IVF-PQ plan over a prebuilt (assigned,
    * bucketed-index, codebook) triple — rep-parametric so the stage
    * A/B (ScaleKnobs) times both scoring representations against ONE
    * build. Returns (cands, shortlist, topk), all unsealed.
    */
  private[graft] def annPqProbeFrames(assigned: DataFrame, corpus: DataFrame,
      book: org.apache.spark.broadcast.Broadcast[graft.functions.PqBook],
      cells: Int, probes: Int, k: Int, nSub: Int, nCodes: Int,
      scoreRep: String): (DataFrame, DataFrame, DataFrame) = {
    // Probe-side shaping, doing THREE jobs with one small shuffle:
    //
    // 1. SPREAD: the materialized assignment frame arrives
    //    AQE-coalesced to a handful of partitions (it is tiny — that
    //    coalesce is right for it), but the candidate join fans each
    //    probe row out by its cell's whole posting list, so candidate
    //    generation AND the shortlist sort inherit the probe side's
    //    parallelism. Un-spread, both ran near-serially (measured
    //    6.5 → 53 s at sf0.1 when the shortlist's old distinct —
    //    whose exchange had been providing the spread by accident —
    //    was removed). A pinned-count hash repartition is the
    //    cheapest possible shuffle here and AQE keeps user-specified
    //    counts. (This repartition IS the join's cell exchange — see
    //    job 3 — so the join output is CELL-distributed and the
    //    shortlist's q_id window costs one candidate-set exchange;
    //    that exchange carries the rank-limit-pre-trimmed set.)
    //
    // 2. THIN wire, THIN sort: under the default DIRECT scoring rep
    //    the probe side carries only (q_id, cell, q, qn2) — the
    //    Dim-long vector, 64 longs — through the exchange AND the
    //    join's sort; every candidate row scores as pq_dot(q, codes)
    //    against the executor-hot broadcast codebook. The classic ADC
    //    table rep ("adc", parity-retained) pre-builds an M×K lookup
    //    table per probe row instead: at the production K=256 that is
    //    2048 longs (16 KB) per row materialized through the
    //    probe-side sort, and its M·K·subDim build multiplies only
    //    amortize when posting lists are ≫ K — at the sf10 production
    //    geometry (≈195 candidates/probe-row < K=256) the table costs
    //    MORE multiplies than direct scoring before counting the
    //    n×probes × 16 KB of array traffic (r15 stage A/B at
    //    sf1/cells=128/hier: full probe 3.0 s direct vs 95.7 s table;
    //    KNOBS_sf10.md carries the sf10 split). Either rep scores the
    //    identical integer, parity spec-pinned.
    //
    // 3. BE the join's exchange — when the geometry can afford it.
    //    Keying the repartition on CELL at the index's bucket count
    //    is exactly the HashPartitioning(cell, cells) the sort-merge
    //    join against the bucketed index requires: EnsureRequirements
    //    adds no further exchange. The first native cut keyed on q_id
    //    and the join re-exchanged the (then 16 KB/row ADC-table) rows
    //    by cell — 493/578 s at sf10/K=256 vs 316/284 keyed on cell.
    //    BUT cell keying also caps the heaviest stage (sort +
    //    candidate scoring) at `cells` tasks, which at the small GATE
    //    geometry starves the machine: cells=16 on 32 cores measured
    //    38-41 s at sf1 vs 12-15 s with the q_id spread (isolated
    //    2-rep A/B, r14). So the keying is geometry-dependent:
    //    cells >= parallelism (every production sizing — cells ∝
    //    √corpus) takes the exchange-free cell path; smaller gate
    //    geometries keep the full-parallelism q_id spread and let the
    //    join add its own cell exchange — under the direct rep that
    //    exchange carries the same thin (q_id, cell, q, qn2) rows, so
    //    nothing K-scaled ever crosses a wire on EITHER branch (the
    //    r14 q_id-branch caveat — ADC tables riding the join's cell
    //    exchange — is gone with the table itself).
    val parallelism = assigned.sparkSession.sessionState.conf.numShufflePartitions
    val spreadKeyed = assigned
      .select(
        col("vec_id").as("q_id"), col("cent_id").as("cell"),
        col("q"), col("n2").as("qn2"))
    val spread =
      if (cells >= parallelism) spreadKeyed.repartition(cells, col("cell"))
      else spreadKeyed.repartition(parallelism, col("q_id"))
    // no distinct over the candidate set: each corpus vector lives in
    // exactly ONE cell (crnk = 1) and a query probes DISTINCT cells,
    // so a (q_id, n_id) pair can arise from at most one join row —
    // uniqueness holds by construction (spec-pinned), and a distinct
    // here would re-shuffle the full candidate set for nothing.
    // Both reps project the scored value through the SAME scoreE6
    // template over an integer dot that is bit-identical (parity
    // spec-pinned), so the rep choice can never move a gate hash.
    val cands = scoreRep match {
      case "direct" =>
        spread.join(corpus, "cell")
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"), col("qn2"), col("rn2"),
            graft.functions.PqExprs.dot(col("q"), col("codes"), book).as("_dot"))
          .select(col("q_id"), col("n_id"),
            expr(scoreE6("_dot", "qn2", "rn2")).as("adc_e6"))
      case "adc" =>
        spread
          .select(col("q_id"), col("cell"),
            graft.functions.PqExprs.adcTable(col("q"), book).as("adc"), col("qn2"))
          .join(corpus, "cell")
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            expr(scoreE6(pqAdcDot("adc", "codes", nSub, nCodes), "qn2", "rn2")).as("adc_e6"))
      case other => throw new IllegalArgumentException(
        s"ann_pq scoreRep must be 'direct' or 'adc', got '$other'")
    }
    // exact re-rank of the ADC top-R shortlist (the production IVF-PQ
    // shape): true vectors are fetched for R ids per query only — the
    // output scores are EXACT cosine; PQ is purely the pruner.
    // The top-R selection is the bounded aggregate (topkPerQuery),
    // NOT a rank window — at sf10 the window's per-partition sort of
    // the 312 M-row candidate set WAS the probe (236.9 s of a ~255 s
    // probe, KNOBS_sf10.md r15); the aggregate's exchange carries
    // ≤ R slots per (q_id, map task) and sorts nothing.
    val shortlist = topkPerQuery(cands, "adc_e6", PqRerank)
      .select("q_id", "n_id")
    val exactQ = assigned.filter(col("crnk") === 1)
      .select(col("vec_id"), col("q"), col("n2"))
    val rescored = shortlist
      .join(exactQ.select(col("vec_id").as("q_id"), col("q").as("qq"), col("n2").as("qn2")), "q_id")
      .join(exactQ.select(col("vec_id").as("n_id"), col("q").as("nq"), col("n2").as("nn2")), "n_id")
      .select(col("q_id"), col("n_id"),
        expr(scoreE6(dotExpr("qq", "nq"), "qn2", "nn2")).as("score_e6"))
    val topk = topkPerQuery(rescored, "score_e6", k)
    (cands, shortlist, topk)
  }

  /** The PQ index frame: (cell, n_id, codes[M], rn2) — the ONLY corpus
    * columns the candidate join shuffles. rn2 = Σ_m ‖codeword_m‖² =
    * ‖reconstruction‖² exactly (subspaces partition the dims).
    * Encode and rn2 are native against the broadcast codebook
    * (pq_encode / pq_rn2) — parity with the literal pqCodesExpr /
    * cn2-gather plan is spec-pinned.
    */
  private[graft] def pqIndexOf(base: DataFrame,
      book: org.apache.spark.broadcast.Broadcast[graft.functions.PqBook]): DataFrame =
    base.select(col("vec_id").as("n_id"), col("cent_id").as("cell"),
        graft.functions.PqExprs.encode(col("q"), book).as("codes"))
      .withColumn("rn2", graft.functions.PqExprs.rn2(col("codes"), book))
      .filter(col("rn2") > 0)

  /** The oracle re-derives EVERYTHING — IVF cells, PQ codebook
    * training, encoding, shortlist, re-rank — from the parquet. The
    * shortlist scores candidates as cosine(query, reconstructed
    * neighbor), which equals the Spark side's ADC sum exactly
    * (integer arithmetic throughout; the only IEEE ops are the same
    * sqrt/mul/div/floor every scoreE6 consumer already pins); the
    * final scores are exact cosine over the re-ranked shortlist.
    */
  def annPqSql: String =
    s"""WITH $quantizedDuckCte,
       |seeds AS (
       |  SELECT vec_id AS cent_id, q AS cq, n2 AS cn2 FROM qv WHERE vec_id < $IvfCells),
       |sassign AS (
       |  SELECT vec_id, q, cent_id FROM (
       |    SELECT v.vec_id, v.q, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${scoreE6(dotDuck("v.q", "c.cq"), "v.n2", "c.cn2")} DESC, c.cent_id) AS crnk
       |    FROM qv v CROSS JOIN seeds c) t
       |  WHERE crnk = 1),
       |rm AS (
       |  SELECT cent_id, p.pos AS pos,
       |    CAST(FLOOR(SUM(q[p.pos + 1]) / COUNT(*)) AS BIGINT) AS m
       |  FROM sassign, range(0, $Dim) p(pos)
       |  GROUP BY cent_id, p.pos),
       |cents0 AS (
       |  SELECT cent_id, list(m ORDER BY pos) AS cq FROM rm GROUP BY cent_id),
       |cents AS (
       |  SELECT * FROM (
       |    SELECT cent_id, cq, ${dotDuck("cq", "cq")} AS cn2 FROM cents0) t
       |  WHERE cn2 > 0),
       |assign AS (
       |  SELECT v.vec_id, v.q, v.n2, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${scoreE6(dotDuck("v.q", "c.cq"), "v.n2", "c.cn2")} DESC, c.cent_id) AS crnk
       |  FROM qv v CROSS JOIN cents c),
       |base AS (
       |  SELECT vec_id, q, n2, cent_id FROM assign WHERE crnk = 1),
       |sv AS (
       |  SELECT vec_id, t.m AS m,
       |    q[(t.m * $PqSubDim + 1):((t.m + 1) * $PqSubDim)] AS sq
       |  FROM base, range(0, $PqSub) t(m)),
       |sv2 AS (
       |  SELECT vec_id, m, sq, ${dotDuck("sq", "sq")} AS sn2 FROM sv),
       |pseeds AS (
       |  SELECT m, vec_id AS code, sq AS cq, sn2 AS cn2 FROM sv2 WHERE vec_id < $PqCodes),
       |passign AS (
       |  SELECT m, code, sq FROM (
       |    SELECT s.m, s.vec_id, s.sq, c.code,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY s.sn2 - 2 * ${dotDuck("s.sq", "c.cq")} + c.cn2, c.code) AS prnk
       |    FROM sv2 s JOIN pseeds c USING (m)) t
       |  WHERE prnk = 1),
       |pmean AS (
       |  SELECT m, code, p.pos AS pos,
       |    CAST(FLOOR(SUM(sq[p.pos + 1]) / COUNT(*)) AS BIGINT) AS cm
       |  FROM passign, range(0, $PqSubDim) p(pos)
       |  GROUP BY m, code, p.pos),
       |pcb0 AS (
       |  SELECT m, code, list(cm ORDER BY pos) AS cq FROM pmean GROUP BY m, code),
       |pcb AS (
       |  SELECT m, code, cq, ${dotDuck("cq", "cq")} AS cn2 FROM pcb0),
       |enc AS (
       |  SELECT vec_id, m, cq, cn2 FROM (
       |    SELECT s.vec_id, s.m, c.cq, c.cn2,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY s.sn2 - 2 * ${dotDuck("s.sq", "c.cq")} + c.cn2, c.code) AS prnk
       |    FROM sv2 s JOIN pcb c USING (m)) t
       |  WHERE prnk = 1),
       |recon AS (
       |  SELECT vec_id, flatten(list(cq ORDER BY m)) AS rq, SUM(cn2) AS rn2
       |  FROM enc GROUP BY vec_id HAVING SUM(cn2) > 0),
       |corpus AS (
       |  SELECT b.vec_id AS n_id, b.cent_id AS cell, r.rq, r.rn2
       |  FROM base b JOIN recon r ON b.vec_id = r.vec_id),
       |pqueries AS (
       |  SELECT vec_id AS q_id, q AS qq, n2 AS qn2, cent_id AS cell
       |  FROM assign WHERE crnk <= $IvfProbes),
       |cands AS (
       |  SELECT DISTINCT q_id, n_id,
       |    ${scoreE6(dotDuck("qq", "rq"), "qn2", "rn2")} AS adc_e6
       |  FROM pqueries JOIN corpus USING (cell)
       |  WHERE q_id <> n_id),
       |shortlist AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_e6 DESC, n_id) AS srnk
       |    FROM cands) t
       |  WHERE srnk <= $PqRerank),
       |rescored AS (
       |  SELECT s.q_id, s.n_id,
       |    ${scoreE6(dotDuck("a.q", "b.q"), "a.n2", "b.n2")} AS score_e6
       |  FROM shortlist s
       |  JOIN base a ON s.q_id = a.vec_id
       |  JOIN base b ON s.n_id = b.vec_id)
       |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, n_id, score_e6 FROM (
       |  SELECT q_id, n_id, score_e6,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score_e6 DESC, n_id) AS rnk
       |  FROM rescored) t
       |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin

  /** Per-label embedding-space QA — the labeled-training-data quality
    * check: class size, centroid norm², and mean cosine-to-centroid
    * (class TIGHTNESS, e6 — a collapsing/mislabeled class shows up as
    * a low mean). Centroids are the same deterministic integer
    * floor-of-mean the IVF/PQ training uses, so the whole metric is
    * oracle-expressible; zero-norm centroids drop on both engines.
    *
    * Scale posture: quantization is row-local; the centroid build is
    * ONE linear (label, dim)-keyed aggregation; the label set is a
    * bounded dim (class cardinality, not corpus-scaled), so the
    * centroid table rides a broadcast; the scoring pass is one more
    * linear scan + a label-keyed rollup. The mean divides as
    * FLOOR(double) — exact for sums < 2^53 and portable, where an
    * integer DIV would diverge between engines on a negative sum
    * (truncation vs floor).
    */
  def embedStats(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val e = graft.Scratch.cp(Tables.embeddings(spark, dir)
      // NO spread: fan-out measured worse here (paired 1.67 -> 1.92)
      .select(col("vec_id"), col("label"), expr(quantExpr).as("q"))
      .withColumn("n2", expr(dotExpr("q", "q")))
      .filter(col("n2") > 0))
    val cents = e
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(expr("CAST(FLOOR(SUM(x) / COUNT(*)) AS BIGINT)").as("m"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cq"))
      .withColumn("cn2", expr(dotExpr("cq", "cq")))
      .filter(col("cn2") > 0)
    val stats = e.join(broadcast(cents), "label") // bounded: one row per label
      .withColumn("cos_e6", expr(scoreE6(dotExpr("q", "cq"), "n2", "cn2")))
      .groupBy("label")
      .agg(count(lit(1)).cast(LongType).as("n_vecs"),
        min("cn2").as("cent_n2"),
        expr("CAST(FLOOR(CAST(SUM(cos_e6) AS DOUBLE) / COUNT(*)) AS BIGINT)")
          .as("mean_cos_e6"))
    graft.Scratch.seal(stats, e).orderBy("label")
  }

  def embedStatsSql: String =
    s"""WITH e0 AS (
       |  SELECT vec_id, label, $quantDuck AS q FROM embeddings),
       |e AS (
       |  SELECT * FROM (
       |    SELECT vec_id, label, q, ${dotDuck("q", "q")} AS n2 FROM e0) t
       |  WHERE n2 > 0),
       |cm AS (
       |  SELECT label, p.pos AS pos,
       |    CAST(FLOOR(SUM(q[p.pos + 1]) / COUNT(*)) AS BIGINT) AS m
       |  FROM e, range(0, $Dim) p(pos)
       |  GROUP BY label, p.pos),
       |cents0 AS (
       |  SELECT label, list(m ORDER BY pos) AS cq FROM cm GROUP BY label),
       |cents AS (
       |  SELECT * FROM (
       |    SELECT label, cq, ${dotDuck("cq", "cq")} AS cn2 FROM cents0) t
       |  WHERE cn2 > 0),
       |j AS (
       |  SELECT e.label, c.cn2,
       |    ${scoreE6(dotDuck("e.q", "c.cq"), "e.n2", "c.cn2")} AS cos_e6
       |  FROM e JOIN cents c USING (label))
       |SELECT label, COUNT(*) AS n_vecs, MIN(cn2) AS cent_n2,
       |  CAST(FLOOR(CAST(SUM(cos_e6) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mean_cos_e6
       |FROM j GROUP BY label ORDER BY label""".stripMargin

  /** Daily LSH-index maintenance — APPEND an accepted delta's bucket
    * keys into the existing index without recomputing the corpus:
    * closes the loop for [[graft.streaming.StreamImport]]'s stream_ann
    * (which searches yesterday's static index) exactly as
    * `TextOps.appendWindowIndex` closes the substring index's. Bucket
    * keys are a pure per-row function of the vector (no corpus-wide
    * state — the md5-derived planes are constants), so the append is
    * a bare UNION: no dedup pass, no shuffle, linear in the delta,
    * and merge ≡ recompute (append(index(corpus), delta) row-identical
    * to index(corpus ∪ delta)) is spec-pinned — the bar
    * imp_entity_incremental set.
    */
  def appendBucketIndex(index: DataFrame, newVecs: DataFrame): DataFrame =
    index.unionByName(bucketKeysPlan(quantizePlan(newVecs)))

  /** Gate entry: the post-append index (corpus = vec_id % 10 ≠ 7,
    * delta = the % 10 = 7 arrivals — stream_ann's split) — answered
    * by the oracle RECOMPUTING the whole index from scratch, so the
    * gate itself proves merge ≡ recompute.
    */
  def annIndexAppend(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // NO spread: fan-out measured worse here (paired 1.79 -> 2.13)
    val all = Tables.embeddings(spark, dir)
    val corpusIdx = bucketedOf(
      quantizePlan(all.filter(col("vec_id") % 10 =!= 7)), Bands, BitsPerBand)
    appendBucketIndex(corpusIdx, all.filter(col("vec_id") % 10 === 7))
      .select(col("vec_id"),
        col("band_idx").cast(LongType).as("band_idx"), col("bucket"))
      .orderBy("vec_id", "band_idx")
  }

  def annIndexAppendSql: String =
    s"""WITH $quantizedDuckCte,
       |$bucketedDuckCte
       |SELECT vec_id, CAST(band_idx AS BIGINT) AS band_idx, bucket
       |FROM buckets ORDER BY vec_id, band_idx""".stripMargin

  /** Row-local coarse routing of a quantized frame against a FROZEN
    * broadcast coarse index — (vec_id, cell), cell = the rank-1
    * centroid. The building block [[appendIvfIndex]] shares with the
    * full build.
    */
  private def ivfRouteOf(v: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[graft.functions.IvfCoarseIndex]): DataFrame =
    v.select(col("vec_id"),
      element_at(graft.functions.IvfRoute.column(col("q"), col("n2"), bc, 1, 0), 1)
        .as("cell"))

  /** Daily IVF-index maintenance (r15 verdict item 3 — the
    * [[appendBucketIndex]] / TextOps.appendWindowIndex shape for the
    * coarse-quantized family): APPEND an accepted delta's vectors
    * into the posting lists under the EXISTING centroids — no
    * retrain, no corpus re-route. Routing under a frozen coarse index
    * is a pure per-row function of the vector (the broadcast carries
    * the whole quantizer), so the append is a bare UNION of the
    * delta's routed rows: no shuffle, linear in the delta, and
    * merge ≡ recompute holds BY CONTRACT — "recompute" for a serving
    * IVF index means re-routing every vector under the same
    * corpus-trained centroids (centroid drift is a retrain, a
    * different operation with different semantics), which is exactly
    * what the gate oracle re-derives from scratch in SQL.
    */
  def appendIvfIndex(index: DataFrame, newVecs: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[graft.functions.IvfCoarseIndex]): DataFrame =
    index.unionByName(ivfRouteOf(quantizePlan(newVecs), bc))

  /** Gate entry: the post-append posting-list table (corpus =
    * vec_id % 10 ≠ 7, delta = the % 10 = 7 arrivals — stream_ann's
    * split). Centroids train on the CORPUS ONLY (one Lloyd step, flat
    * gate geometry — annIvfSql's exact recipe restricted to the
    * corpus rows); the delta then routes under them frozen. The
    * oracle recomputes the whole table from scratch — corpus-trained
    * centroids re-derived in SQL, every vector re-routed — so the
    * gate itself proves append ≡ recompute, the bar
    * imp_entity_incremental / ann_index_append set.
    */
  def annIvfAppend(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // NO spread: fan-out measured worse here (paired 1.80 -> 2.96)
    val all = Tables.embeddings(spark, dir)
    val corpus = graft.Scratch.cp(quantizePlan(all.filter(col("vec_id") % 10 =!= 7)))
    val cents = refinedCentroidsRouted(corpus, IvfCells, 1, 0)
    val bc = spark.sparkContext
      .broadcast(graft.functions.IvfCoarseIndex.build(cents, Dim))
    val index = ivfRouteOf(corpus, bc)
    val appended = appendIvfIndex(index, all.filter(col("vec_id") % 10 === 7), bc)
    // seal materializes eagerly, so the broadcast can drop right after
    val out = graft.Scratch.seal(appended, corpus)
    bc.destroy()
    out.orderBy("vec_id")
  }

  def annIvfAppendSql: String =
    s"""WITH $quantizedDuckCte,
       |corpus_v AS (
       |  SELECT * FROM qv WHERE vec_id % 10 <> 7),
       |seeds AS (
       |  SELECT vec_id AS cent_id, q AS cq, n2 AS cn2 FROM corpus_v WHERE vec_id < $IvfCells),
       |sassign AS (
       |  SELECT vec_id, q, cent_id FROM (
       |    SELECT v.vec_id, v.q, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${scoreE6(dotDuck("v.q", "c.cq"), "v.n2", "c.cn2")} DESC, c.cent_id) AS crnk
       |    FROM corpus_v v CROSS JOIN seeds c) t
       |  WHERE crnk = 1),
       |rm AS (
       |  SELECT cent_id, p.pos AS pos,
       |    CAST(FLOOR(SUM(q[p.pos + 1]) / COUNT(*)) AS BIGINT) AS m
       |  FROM sassign, range(0, $Dim) p(pos)
       |  GROUP BY cent_id, p.pos),
       |cents0 AS (
       |  SELECT cent_id, list(m ORDER BY pos) AS cq FROM rm GROUP BY cent_id),
       |cents AS (
       |  SELECT * FROM (
       |    SELECT cent_id, cq, ${dotDuck("cq", "cq")} AS cn2 FROM cents0) t
       |  WHERE cn2 > 0),
       |assign AS (
       |  SELECT v.vec_id, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${scoreE6(dotDuck("v.q", "c.cq"), "v.n2", "c.cn2")} DESC, c.cent_id) AS crnk
       |  FROM qv v CROSS JOIN cents c)
       |SELECT vec_id, cent_id AS cell FROM assign WHERE crnk = 1
       |ORDER BY vec_id""".stripMargin

  /** Daily PQ-index maintenance (r17 verdict item 4 — the third side
    * of the index-maintenance triangle: LSH has [[appendBucketIndex]],
    * IVF has [[appendIvfIndex]]; PQ — the memory-bound family whose
    * whole point is a PERSISTENT serving index — gets the same arm):
    * APPEND an accepted delta's code rows into the existing codes
    * index under the FROZEN corpus-trained coarse centroids AND the
    * frozen corpus-trained PQ codebooks — no retrain, no corpus
    * re-encode. Coarse routing and PQ encoding under frozen
    * quantizers are pure per-row functions of the vector (the two
    * broadcasts carry the whole model), so the append is a bare
    * UNION of the delta's encoded rows: no shuffle, linear in the
    * delta, and merge ≡ recompute holds BY CONTRACT — "recompute"
    * for a serving PQ index means re-routing and re-encoding every
    * vector under the same corpus-trained model (codebook drift is a
    * retrain, a different operation with different semantics), which
    * is exactly what the gate oracle re-derives from scratch in SQL.
    */
  def appendPqIndex(index: DataFrame, newVecs: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[graft.functions.IvfCoarseIndex],
      book: org.apache.spark.broadcast.Broadcast[graft.functions.PqBook]): DataFrame =
    index.unionByName(pqIndexOf(pqRoutedOf(quantizePlan(newVecs), bc), book))

  /** (vec_id, q, n2, cent_id) under a frozen coarse index, rank-1 —
    * the routed shape [[pqIndexOf]] encodes from. Row-local.
    */
  private[graft] def pqRoutedOf(v: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[graft.functions.IvfCoarseIndex]): DataFrame =
    v.withColumn("cent_id",
      element_at(graft.functions.IvfRoute.column(col("q"), col("n2"), bc, 1, 0), 1))

  /** Gate entry: the post-append codes index (corpus = vec_id % 10 ≠
    * 7, delta = the % 10 = 7 arrivals — the split every append gate
    * uses). Coarse centroids train on the CORPUS ONLY (one Lloyd
    * step, flat gate geometry — annIvfAppendSql's exact recipe) and
    * the PQ codebooks train on the routed corpus (one Lloyd step —
    * annPqSql's exact recipe restricted to corpus rows); the delta
    * then routes + encodes under both frozen. The oracle recomputes
    * the WHOLE table from scratch — corpus-trained centroids and
    * codebooks re-derived in SQL, every vector re-routed and
    * re-encoded — so the gate itself proves append ≡ recompute, the
    * bar ann_index_append / ann_ivf_append set. Codes ship as a
    * comma-joined string so the hash gate compares scalars.
    */
  def annPqAppend(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // NO spread: fan-out measured worse here (paired 2.73 -> 4.01)
    val all = Tables.embeddings(spark, dir)
    val corpus = graft.Scratch.cp(quantizePlan(all.filter(col("vec_id") % 10 =!= 7)))
    val cents = refinedCentroidsRouted(corpus, IvfCells, 1, 0)
    val bc = spark.sparkContext
      .broadcast(graft.functions.IvfCoarseIndex.build(cents, Dim))
    // routed corpus materializes ONCE — PQ seed collect, the Lloyd
    // step, and the index encode all consume it
    val routed = graft.Scratch.cp(pqRoutedOf(corpus, bc))
    var cb = pqSeedsOf(routed, PqSubDim, PqSub, PqCodes)
    cb = pqLloydStep(routed, cb, PqSub, PqSubDim, PqCodes)
    val book = spark.sparkContext
      .broadcast(graft.functions.PqBook.build(cb, PqSub, PqSubDim, PqCodes))
    val index = pqIndexOf(routed, book)
    val appended =
      appendPqIndex(index, all.filter(col("vec_id") % 10 === 7), bc, book)
        .select(col("n_id"), col("cell"),
          expr("array_join(transform(codes, x -> CAST(x AS STRING)), ',')")
            .as("codes"),
          col("rn2"))
    // seal materializes eagerly, so both broadcasts can drop right after
    val out = graft.Scratch.seal(appended, routed)
    graft.Scratch.free(corpus)
    bc.destroy()
    book.destroy()
    out.orderBy("n_id")
  }

  /** The oracle re-derives everything from the parquet: corpus-only
    * coarse training (annIvfAppendSql's CTEs), corpus-only PQ
    * codebook training (annPqSql's CTEs restricted to the routed
    * corpus), then routes + encodes EVERY vector — corpus and delta
    * alike — under those frozen models.
    */
  def annPqAppendSql: String =
    s"""WITH $quantizedDuckCte,
       |corpus_v AS (
       |  SELECT * FROM qv WHERE vec_id % 10 <> 7),
       |seeds AS (
       |  SELECT vec_id AS cent_id, q AS cq, n2 AS cn2 FROM corpus_v WHERE vec_id < $IvfCells),
       |sassign AS (
       |  SELECT vec_id, q, cent_id FROM (
       |    SELECT v.vec_id, v.q, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${scoreE6(dotDuck("v.q", "c.cq"), "v.n2", "c.cn2")} DESC, c.cent_id) AS crnk
       |    FROM corpus_v v CROSS JOIN seeds c) t
       |  WHERE crnk = 1),
       |rm AS (
       |  SELECT cent_id, p.pos AS pos,
       |    CAST(FLOOR(SUM(q[p.pos + 1]) / COUNT(*)) AS BIGINT) AS m
       |  FROM sassign, range(0, $Dim) p(pos)
       |  GROUP BY cent_id, p.pos),
       |cents0 AS (
       |  SELECT cent_id, list(m ORDER BY pos) AS cq FROM rm GROUP BY cent_id),
       |cents AS (
       |  SELECT * FROM (
       |    SELECT cent_id, cq, ${dotDuck("cq", "cq")} AS cn2 FROM cents0) t
       |  WHERE cn2 > 0),
       |base AS (
       |  SELECT vec_id, q, cent_id FROM (
       |    SELECT v.vec_id, v.q, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${scoreE6(dotDuck("v.q", "c.cq"), "v.n2", "c.cn2")} DESC, c.cent_id) AS crnk
       |    FROM corpus_v v CROSS JOIN cents c) t
       |  WHERE crnk = 1),
       |sv AS (
       |  SELECT vec_id, t.m AS m,
       |    q[(t.m * $PqSubDim + 1):((t.m + 1) * $PqSubDim)] AS sq
       |  FROM base, range(0, $PqSub) t(m)),
       |sv2 AS (
       |  SELECT vec_id, m, sq, ${dotDuck("sq", "sq")} AS sn2 FROM sv),
       |pseeds AS (
       |  SELECT m, vec_id AS code, sq AS cq, sn2 AS cn2 FROM sv2 WHERE vec_id < $PqCodes),
       |passign AS (
       |  SELECT m, code, sq FROM (
       |    SELECT s.m, s.vec_id, s.sq, c.code,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY s.sn2 - 2 * ${dotDuck("s.sq", "c.cq")} + c.cn2, c.code) AS prnk
       |    FROM sv2 s JOIN pseeds c USING (m)) t
       |  WHERE prnk = 1),
       |pmean AS (
       |  SELECT m, code, p.pos AS pos,
       |    CAST(FLOOR(SUM(sq[p.pos + 1]) / COUNT(*)) AS BIGINT) AS cm
       |  FROM passign, range(0, $PqSubDim) p(pos)
       |  GROUP BY m, code, p.pos),
       |pcb0 AS (
       |  SELECT m, code, list(cm ORDER BY pos) AS cq FROM pmean GROUP BY m, code),
       |pcb AS (
       |  SELECT m, code, cq, ${dotDuck("cq", "cq")} AS cn2 FROM pcb0),
       |allbase AS (
       |  SELECT vec_id, q, cent_id FROM (
       |    SELECT v.vec_id, v.q, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${scoreE6(dotDuck("v.q", "c.cq"), "v.n2", "c.cn2")} DESC, c.cent_id) AS crnk
       |    FROM qv v CROSS JOIN cents c) t
       |  WHERE crnk = 1),
       |asv AS (
       |  SELECT vec_id, t.m AS m,
       |    q[(t.m * $PqSubDim + 1):((t.m + 1) * $PqSubDim)] AS sq
       |  FROM allbase, range(0, $PqSub) t(m)),
       |asv2 AS (
       |  SELECT vec_id, m, sq, ${dotDuck("sq", "sq")} AS sn2 FROM asv),
       |aenc AS (
       |  SELECT vec_id, m, code, cn2 FROM (
       |    SELECT s.vec_id, s.m, c.code, c.cn2,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY s.sn2 - 2 * ${dotDuck("s.sq", "c.cq")} + c.cn2, c.code) AS prnk
       |    FROM asv2 s JOIN pcb c USING (m)) t
       |  WHERE prnk = 1)
       |SELECT b.vec_id AS n_id, b.cent_id AS cell,
       |  string_agg(CAST(e.code AS VARCHAR), ',' ORDER BY e.m) AS codes,
       |  CAST(SUM(e.cn2) AS BIGINT) AS rn2
       |FROM allbase b JOIN aenc e ON b.vec_id = e.vec_id
       |GROUP BY b.vec_id, b.cent_id
       |HAVING SUM(e.cn2) > 0
       |ORDER BY n_id""".stripMargin

  /** Metadata-filtered exact search ("search within my own
    * category"): each bounded probe's neighbor set is restricted to
    * corpus rows sharing its `label`. The filter is NOT a post-filter
    * over a global top-k (which under-fills k whenever true neighbors
    * are cross-label); it is pushed INTO the join as an equi-key, so
    * the plan hash-partitions both sides by label — per-partition work
    * is |probes_l| × |corpus_l|, not |probes| × |corpus|, and a
    * label-selective predicate would reach the parquet scan. The
    * probe side stays the bounded [[ProbeCutoff]] contract; label skew
    * is AQE's skew-join case like any other hot equi-key.
    */
  def annFiltered(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val v = graft.Scratch.cp(
      // fan out before the row-local quantize (§2.5 input skew)
      Tables.spread(Tables.embeddings(spark, dir), "vec_id")
        .withColumn("q", expr(quantExpr))
        .withColumn("n2", expr(dotExpr("q", "q")))
        .filter(col("n2") > 0)
        .select("vec_id", "label", "q", "n2"))
    val joined = v.as("a").filter(col("a.vec_id") < ProbeCutoff)
      .join(v.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("a.label").as("label"),
        col("b.vec_id").as("n_id"),
        expr(scoreE6(dotExpr("a.q", "b.q"), "a.n2", "b.n2")).as("score_e6"))
    // label is functionally determined by q_id, so grouping on both
    // carries it through the aggregate without a join-back
    val topk = topkPerQuery(joined, "score_e6", 3, keys = Seq("q_id", "label"))
    graft.Scratch.seal(topk, v).orderBy("q_id", "rnk")
  }

  def annFilteredSql: String =
    s"""WITH q0 AS (
       |  SELECT vec_id, label, $quantDuck AS q FROM embeddings),
       |qv AS (
       |  SELECT * FROM (
       |    SELECT vec_id, label, q, ${dotDuck("q", "q")} AS n2 FROM q0) t
       |  WHERE n2 > 0)
       |SELECT q_id, label, CAST(rnk AS BIGINT) AS rnk, n_id, score_e6 FROM (
       |  SELECT a.vec_id AS q_id, a.label AS label, b.vec_id AS n_id,
       |    ${scoreE6(dotDuck("a.q", "b.q"), "a.n2", "b.n2")} AS score_e6,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${scoreE6(dotDuck("a.q", "b.q"), "a.n2", "b.n2")} DESC, b.vec_id) AS rnk
       |  FROM (SELECT * FROM qv WHERE vec_id < $ProbeCutoff) a
       |  JOIN qv b ON a.label = b.label AND a.vec_id <> b.vec_id) t
       |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin

  /** Int8 scalar quantization (the SQ8 compression ANN serving
    * stacks pair with coarse indexes): each dimension affine-maps to
    * a 0..255 code from its corpus-wide [lo, hi] — 4 bytes/dim float
    * down to 1 byte/dim, the difference between an index that fits
    * executor memory and one that doesn't. Two passes, like the
    * z-order layout's normalization: (1) a per-DIMENSION min/max
    * aggregate — map-side partials collapse each partition to Dim
    * rows, the stats frame is Dim rows total and rides a broadcast
    * (fixed-size by construction); (2) the encode itself, row-local
    * integer arithmetic on the shared e4-quantized domain
    * ([[quantExpr]]) — exact, engine-portable, no float division
    * (the affine map is `(x - lo) * 255 DIV max(hi - lo, 1)`, all
    * nonneg integer ops, so truncation == floor on both engines).
    * Output exploded to (vec_id, pos, code) — list-valued gate
    * columns don't stringify portably. The reconstruction-error
    * bound (≤ one quantization step per dim) is spec-pinned.
    */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val x = graft.Scratch.cp(Tables.embeddings(spark, dir)
      // NO spread: sf0.1 isolated worse (0.80 -> 1.28) for a small
      // sf1 gain — the posexplode feeds a shuffle immediately
      .select(col("vec_id"), posexplode(expr(quantExpr)).as(Seq("pos", "x"))))
    val stats = x.groupBy("pos")
      .agg(min("x").as("lo"), max("x").as("hi")) // Dim rows, total
    val out = x.join(broadcast(stats), "pos")
      .select(col("vec_id"), col("pos").cast(LongType).as("pos"),
        expr("CAST((x - lo) * 255 DIV greatest(hi - lo, 1) AS BIGINT)").as("code"))
      .orderBy("vec_id", "pos")
    graft.Scratch.seal(out, x)
  }

  def embedQuantizeSql: String =
    s"""WITH e AS (SELECT vec_id, $quantDuck AS q FROM embeddings),
       |x AS (
       |  SELECT vec_id, p.pos AS pos, q[p.pos + 1] AS x
       |  FROM e, range(0, $Dim) p(pos)),
       |s AS (SELECT pos, MIN(x) AS lo, MAX(x) AS hi FROM x GROUP BY pos)
       |SELECT x.vec_id, CAST(x.pos AS BIGINT) AS pos,
       |  CAST((x.x - s.lo) * 255 // GREATEST(s.hi - s.lo, 1) AS BIGINT) AS code
       |FROM x JOIN s USING (pos) ORDER BY vec_id, pos""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> (annBruteforce _),
    "embed_quantize" -> (embedQuantize _),
    "ann_filtered" -> (annFiltered _),
    "ann_index_append" -> (annIndexAppend _),
    "ann_ivf_append" -> (annIvfAppend _),
    "ann_pq_append" -> (annPqAppend _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _),
    "ann_ivf_hier" -> (annIvfHier _),
    "ann_ivf_prod" -> (annIvfProd _),
    "ann_pq" -> (annPq _),
    "embed_stats" -> (embedStats _),
    "dedup_embed" -> (dedupEmbed _))

  def oracles: Map[String, String] = Map(
    "ann_bruteforce" -> annBruteforceSql,
    "embed_quantize" -> embedQuantizeSql,
    "ann_filtered" -> annFilteredSql,
    "ann_index_append" -> annIndexAppendSql,
    "ann_ivf_append" -> annIvfAppendSql,
    "ann_pq_append" -> annPqAppendSql,
    "ann_lsh" -> annLshSql,
    "ann_ivf" -> annIvfSql,
    "ann_ivf_hier" -> annIvfHierSql,
    "ann_ivf_prod" -> annIvfProdSql,
    "ann_pq" -> annPqSql,
    "embed_stats" -> embedStatsSql,
    "dedup_embed" -> dedupEmbedSql)
}
