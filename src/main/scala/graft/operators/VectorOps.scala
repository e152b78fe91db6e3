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
    * Spark-side the planes are folded to LITERAL arrays at plan build
    * (they are constants — recomputing 16×64 md5s per row was the
    * dominant cost of the bucketed ops).
    */
  private def planeValue(j: Int, i: Int): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${j}_$i".getBytes("UTF-8"))
    val hex = digest.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
  }

  private def planeExpr(j: Int): String =
    (0 until Dim).map(i => s"${planeValue(j, i)}L").mkString("array(", ", ", ")")

  private def planeDuck(j: Int): String =
    s"[CAST(CAST(CONCAT('0x', SUBSTRING(md5(CONCAT('$j', '_', CAST(i AS VARCHAR))),1,15)) AS UBIGINT) % 2001 AS BIGINT) - 1000 " +
      s"for i in range(0, $Dim)]"

  /** vectors + quantization + norm², all row-local. Zero-norm vectors
    * (all components quantize to 0) are dropped — cosine is undefined
    * for them, and NaN semantics differ between engines (Spark CAST
    * maps NaN to 0; DuckDB errors). The oracle applies the same guard.
    */
  private def quantized(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // materialized once: every consumer is a self-join or multi-read
    graft.Scratch.cp(Tables.embeddings(spark, dir)
      .withColumn("q", expr(quantExpr))
      .withColumn("n2", expr(dotExpr("q", "q")))
      .filter(col("n2") > 0)
      .select("vec_id", "q", "n2"))
  }

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
      bands: Int = Bands, bitsPerBand: Int = BitsPerBand): DataFrame =
    bucketedFrom(quantized(spark, dir), bands, bitsPerBand)

  /** Bucket keys over a caller-supplied quantized frame
    * (vec_id, q, n2) — the corpus-independent entry the recall specs
    * drive with synthetic clustered vectors.
    */
  private[graft] def bucketedOf(qIn: DataFrame,
      bands: Int, bitsPerBand: Int): DataFrame =
    bucketedFrom(graft.Scratch.cp(qIn), bands, bitsPerBand)

  private def bucketedFrom(q: DataFrame,
      bands: Int, bitsPerBand: Int): DataFrame = {
    val nPlanes = bands * bitsPerBand
    val withBits = (0 until nPlanes).foldLeft(q) { (d, j) =>
      d.withColumn(s"bit$j",
        expr(s"IF(${dotExpr("q", planeExpr(j))} >= 0, CAST(1 AS BIGINT), CAST(0 AS BIGINT))"))
    }
    val withBuckets = (0 until bands).foldLeft(withBits) { (d, b) =>
      val bits = (0 until bitsPerBand)
        .map(k => s"shiftleft(bit${b * bitsPerBand + k}, $k)").mkString(" + ")
      d.withColumn(s"bucket$b", expr(bits))
    }
    // materialized once: quantization + the hyperplane dots feed both
    // self-join sides of ann_lsh / dedup_embed; the quantized frame is
    // subsumed by this one and released immediately
    graft.Scratch.seal(
      withBuckets.select(col("vec_id"), col("q"), col("n2"),
        explode(expr(s"map_from_arrays(sequence(0, ${bands - 1}), " +
          s"array(${(0 until bands).map(b => s"bucket$b").mkString(",")}))")))
        .toDF("vec_id", "q", "n2", "band_idx", "bucket"),
      q)
  }

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
    val w = Window.partitionBy("q_id").orderBy(col("score_e6").desc, col("n_id"))
    joined.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast(LongType).as("rnk"), col("n_id"), col("score_e6"))
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
    lshTopkFrom(bucketed(spark, dir, bands, bitsPerBand), k)

  /** ann_lsh over a caller-supplied quantized frame — used by the
    * recall-floor spec to compare against brute force on a controlled
    * corpus.
    */
  def annLshOf(qIn: DataFrame, bands: Int = Bands,
      bitsPerBand: Int = BitsPerBand, k: Int = 3): DataFrame =
    lshTopkFrom(bucketedOf(qIn, bands, bitsPerBand), k)

  private def lshTopkFrom(b: DataFrame, k: Int): DataFrame = {
    val cands = b.as("a").join(b.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
        expr(scoreE6(dotExpr("a.q", "b.q"), "a.n2", "b.n2")).as("score_e6"))
      .distinct()
    val w = Window.partitionBy("q_id").orderBy(col("score_e6").desc, col("n_id"))
    val topk = cands.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast(LongType).as("rnk"), col("n_id"), col("score_e6"))
    graft.Scratch.seal(topk, b).orderBy("q_id", "rnk")
  }

  /** Embedding-cosine near-dup: LSH-bucket candidates, exact
    * fixed-point cosine >= 0.40 — pairs (a < b). The full oracle
    * reproduces bucketing AND scoring, so recall semantics are pinned,
    * not just row counts.
    */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    val b = bucketed(spark, dir)
    val pairs = b.as("a").join(b.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        expr(scoreE6(dotExpr("a.q", "b.q"), "a.n2", "b.n2")).as("score_e6"))
      .distinct()
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

  /** Seed centroids refined by `iters` Lloyd steps (0 = raw seeds). */
  private def refinedCentroids(v: DataFrame, cells: Int, iters: Int): DataFrame = {
    var cents = v.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"), col("n2").as("cn2"))
    for (_ <- 0 until iters) {
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
    cents
  }

  /** One pass: top-`probes` cells per vector against the refined
    * centroids, materialized — the corpus side is the crnk=1 filter of
    * the SAME frame (computing assignments separately per side would
    * re-run the scoring + window twice).
    */
  private def cellAssignmentsOf(v: DataFrame,
      cells: Int, probes: Int, lloydIters: Int): DataFrame = {
    val cents = refinedCentroids(v, cells, lloydIters)
    val scored = v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"), col("n2"), col("cent_id"),
        expr(scoreE6(dotExpr("q", "cq"), "n2", "cn2")).as("cscore"))
    val w = Window.partitionBy("vec_id").orderBy(col("cscore").desc, col("cent_id"))
    // subsumes the quantized frame (assignment rows carry q, n2)
    graft.Scratch.seal(
      scored.withColumn("crnk", row_number().over(w))
        .filter(col("crnk") <= probes),
      v)
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    annIvfWith(spark, dir, IvfCells, IvfProbes)

  /** ann_ivf with explicit cell/probe counts — the scale knob (cells
    * grows with corpus size so each cell's slice stays
    * executor-sized; recall tunes with probes and Lloyd iterations).
    * The default geometry keeps the full oracle; the centroid side
    * stays a broadcast of `cells` rows.
    */
  def annIvfWith(spark: SparkSession, dir: String,
      cells: Int, probes: Int, k: Int = 3, lloydIters: Int = 1): DataFrame =
    annIvfOf(quantized(spark, dir), cells, probes, k, lloydIters)

  /** ann_ivf over an externally supplied quantized frame (vec_id, q,
    * n2) — consumed (and released) by this call; the recall spec feeds
    * synthetic clustered corpora through it.
    */
  def annIvfOf(v: DataFrame,
      cells: Int, probes: Int, k: Int, lloydIters: Int): DataFrame = {
    val assigned = cellAssignmentsOf(v, cells, probes, lloydIters)
    val corpus = assigned.filter(col("crnk") === 1)
      .select(col("vec_id").as("n_id"), col("q").as("nq"), col("n2").as("nn2"),
        col("cent_id").as("cell"))
    val queriesSide = assigned
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("n2").as("qn2"),
        col("cent_id").as("cell"))
    val cands = queriesSide.join(corpus, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        expr(scoreE6(dotExpr("qq", "nq"), "qn2", "nn2")).as("score_e6"))
      .distinct()
    val w = Window.partitionBy("q_id").orderBy(col("score_e6").desc, col("n_id"))
    val topk = cands.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast(LongType).as("rnk"), col("n_id"), col("score_e6"))
    graft.Scratch.seal(topk, assigned).orderBy("q_id", "rnk")
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> (annBruteforce _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _),
    "dedup_embed" -> (dedupEmbed _))

  def oracles: Map[String, String] = Map(
    "ann_bruteforce" -> annBruteforceSql,
    "ann_lsh" -> annLshSql,
    "ann_ivf" -> annIvfSql,
    "dedup_embed" -> dedupEmbedSql)
}
