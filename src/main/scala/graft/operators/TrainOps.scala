package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-data assembly operators a 100 TB pipeline runs after
  * filtering/dedup: deterministic stratified sampling and
  * token-budget sequence packing. Both are pure column arithmetic +
  * one bounded-width window — no collect, no unbounded state, and the
  * sampling decision is a pure function of the doc id (re-runs and
  * backfills pick the SAME rows, the property ad-hoc `rand()`
  * sampling loses).
  */
object TrainOps {

  /** Spark/DuckDB-portable 60-bit hash of a salted doc id. */
  private def saltedHash(salt: String) =
    s"graft_hash60(concat('$salt', CAST(doc_id AS STRING)))"

  private def saltedHashDuck(salt: String) =
    graft.functions.Portable.hash60Duck(s"CONCAT('$salt', CAST(doc_id AS VARCHAR))")

  // quality stratum: the same rule as TextOps.textQuality's bucket
  // (mid-length prose with sane stopword density) — inlined so the
  // sampler is self-contained
  private val stratumExpr =
    """CASE WHEN len BETWEEN 30 AND 400 AND 10000 * n_stop DIV len BETWEEN 100 AND 3000
      |     THEN 'good' ELSE 'low' END""".stripMargin
  private val stratumDuck =
    """CASE WHEN len BETWEEN 30 AND 400 AND 10000 * n_stop // len BETWEEN 100 AND 3000
      |     THEN 'good' ELSE 'low' END""".stripMargin

  /** Stratified downsampling with per-stratum keep rates (keep 80% of
    * 'good' prose, 10% of 'low') decided by hash bucket, not rand():
    * deterministic, seedable via the salt, and exactly reproducible in
    * the oracle. Row-local — no shuffle before the presentation sort.
    */
  def pipeSample(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // materialize-once before the presentation sort (r18 plan audit)
    graft.Scratch.cpSorted(Tables.spread(Tables.documents(spark, dir), "doc_id")
      .withColumn("len", size(split(col("text"), " ")).cast(LongType))
      .withColumn("n_stop",
        size(expr("filter(split(text,' '), t -> t = 'the' OR t = 'a')")).cast(LongType))
      .withColumn("stratum", expr(stratumExpr))
      .withColumn("h_e4", expr(s"${saltedHash("smp|")} % 10000"))
      .filter((col("stratum") === "good" && col("h_e4") < 8000) ||
        (col("stratum") === "low" && col("h_e4") < 1000))
      .select(col("doc_id"), col("stratum"), col("h_e4")),
      col("doc_id"))
  }

  def pipeSampleSql: String =
    s"""WITH q AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text,' ')) AS BIGINT) AS len,
       |    CAST(len(list_filter(string_split(text,' '), t -> t = 'the' OR t = 'a')) AS BIGINT) AS n_stop
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    $stratumDuck AS stratum,
       |    ${saltedHashDuck("smp|")} % 10000 AS h_e4
       |  FROM q)
       |SELECT doc_id, stratum, h_e4 FROM s
       |WHERE (stratum = 'good' AND h_e4 < 8000)
       |   OR (stratum = 'low' AND h_e4 < 1000)
       |ORDER BY doc_id""".stripMargin

  /** Sequence packing: assign each doc to a token-budget bin (the
    * pre-tokenization pass that turns a filtered corpus into
    * fixed-length training sequences). Docs are hash-sharded, then
    * greedily packed IN DOC-ID ORDER within their shard by running
    * token cumsum — bin = tokens-before DIV budget (the streaming
    * packer's split rule; a doc straddling a boundary starts its bin).
    *
    * Scale posture: the only non-row-local step is a window
    * partitioned by shard — parallelism = shard count (set it to
    * O(cores×executors) at scale), never a global single-partition
    * sort. Shard assignment is the same portable salted hash as the
    * sampler, so packing is reproducible run-to-run.
    */
  /** Shared by BOTH the Spark plan and the oracle SQL — a change here
    * re-derives the two renderings together (they must agree bin-for-bin).
    */
  val PackBudget = 512L
  val PackShards = 8L

  /** The packer's row-local input derivation (token count + shard
    * assignment) — ONE definition shared by the batch window plan
    * below and the streaming packer's stateful fold
    * (graft.streaming.StreamImport.packStream), so the two can never
    * disagree on shard geometry. Caller must have GraftFunctions
    * registered on the frame's session.
    */
  def packInput(docs: DataFrame): DataFrame =
    // fan out before the tokenize (§2.5 input skew)
    Tables.spread(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("tok"))
      .withColumn("shard", expr(s"${saltedHash("pack|")} % $PackShards"))

  def pipePack(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val w = Window.partitionBy("shard").orderBy("doc_id")
    packInput(Tables.documents(spark, dir))
      .withColumn("cum", sum(col("tok")).over(w))
      .select(col("doc_id"), col("shard"), col("tok"),
        (col("cum") - col("tok")).as("tok_before"),
        expr(s"(cum - tok) DIV $PackBudget").as("bin"))
      .orderBy("doc_id")
  }

  def pipePackSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text,' ')) AS BIGINT) AS tok,
       |    ${saltedHashDuck("pack|")} % $PackShards AS shard
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, shard, tok,
       |    SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t)
       |SELECT doc_id, shard, tok,
       |  CAST(cum - tok AS BIGINT) AS tok_before,
       |  CAST((cum - tok) // $PackBudget AS BIGINT) AS bin
       |FROM c ORDER BY doc_id""".stripMargin

  /** Source-mixture weighting — the "data mixing" stage that sets how
    * much of each PROVENANCE a training run sees. Every source carries
    * a target weight (fixed-point e4: 10000 = 1.0×); weights below 1×
    * hash-downsample like [[pipeSample]], weights above 1× UPSAMPLE by
    * emitting whole copies plus a hash-decided fractional copy — the
    * epoch-repetition semantics mixture configs express (e.g. "2.3×
    * wikipedia, 0.4× crawl"). The per-doc copy count is a pure
    * function of (source, doc_id), so re-runs and backfills emit the
    * IDENTICAL mixture.
    *
    * The weight table here is derived from the source name's portable
    * hash (a deterministic stand-in for the run's mixture config, so
    * the oracle can reproduce it); production passes an explicit map.
    *
    * Scale posture: row-local decide + explode (no shuffle before the
    * presentation sort); output size = corpus × mean weight, the
    * mixture's own cost.
    */
  def pipeMix(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // weight_e4 ∈ [0.3×, 2.5×) per source — deterministic config stand-in
    val weightE4 = "3000 + graft_hash60(concat('mixw|', source)) % 22000"
    val frac = s"IF(graft_hash60(concat('mixf|', CAST(doc_id AS STRING))) % 10000 < ($weightE4) % 10000, 1, 0)"
    // materialize-once before the presentation sort (r18 plan audit)
    graft.Scratch.cpSorted(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("weight_e4", expr(weightE4).cast(LongType))
      .withColumn("n_copies", expr(s"($weightE4) DIV 10000 + $frac").cast(LongType))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("weight_e4"),
        explode(expr("sequence(CAST(0 AS BIGINT), n_copies - 1)")).as("copy")),
      col("doc_id"), col("copy"))
  }

  def pipeMixSql: String = {
    val weightE4 = "3000 + " +
      graft.functions.Portable.hash60Duck("CONCAT('mixw|', source)") + " % 22000"
    val frac = "CASE WHEN " +
      graft.functions.Portable.hash60Duck("CONCAT('mixf|', CAST(doc_id AS VARCHAR))") +
      s" % 10000 < ($weightE4) % 10000 THEN 1 ELSE 0 END"
    s"""WITH w AS (
       |  SELECT doc_id, source,
       |    CAST($weightE4 AS BIGINT) AS weight_e4,
       |    CAST(($weightE4) // 10000 + $frac AS BIGINT) AS n_copies
       |  FROM documents)
       |SELECT doc_id, source, weight_e4,
       |  CAST(unnest(range(n_copies)) AS BIGINT) AS copy
       |FROM w WHERE n_copies > 0
       |ORDER BY doc_id, copy""".stripMargin
  }

  /** Epoch-seeded deterministic training order — the global shuffle a
    * training run needs WITHOUT a global sort: docs hash to a shard
    * (parallel read stream) and rank within it by an epoch-salted
    * hash. Changing the epoch string reshuffles; re-running the same
    * epoch reproduces the order bit-for-bit (what `ORDER BY rand()`
    * can never give a resumable trainer).
    *
    * Scale posture: the window is partitioned by shard — parallelism =
    * shard count, no single-reducer global sort; the trainer consumes
    * shards round-robin.
    */
  val ShuffleShards = 8L
  val ShuffleEpoch = "ep1"

  def pipeShuffle(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val ordHash = s"graft_hash60(concat('shuf|$ShuffleEpoch|', CAST(doc_id AS STRING)))"
    val w = Window.partitionBy("shard").orderBy(col("ord"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr(s"$ordHash % $ShuffleShards").as("shard"),
        expr(ordHash).as("ord"))
      .withColumn("pos", (row_number().over(w) - 1).cast(LongType))
      .select("doc_id", "shard", "pos")
      .orderBy("doc_id")
  }

  def pipeShuffleSql: String = {
    val ordHash = graft.functions.Portable.hash60Duck(
      s"CONCAT('shuf|$ShuffleEpoch|', CAST(doc_id AS VARCHAR))")
    s"""WITH h AS (
       |  SELECT doc_id,
       |    $ordHash % $ShuffleShards AS shard,
       |    $ordHash AS ord
       |  FROM documents)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id) - 1 AS BIGINT) AS pos
       |FROM h ORDER BY doc_id""".stripMargin
  }

  /** Curriculum-ordered training sequence: band documents by an
    * easy-to-hard difficulty proxy (average word length — short-word
    * prose first), then give each band a deterministic salted-hash
    * reading order, sharded exactly like [[pipeShuffle]]. The banding
    * uses FIXED thresholds (corpus quartiles at authoring time), not
    * NTILE: quantile banding needs a global sort/percentile pass and
    * re-bands every doc whenever the corpus grows, while fixed cuts
    * are row-local, scale-free, and stable under backfill — the same
    * argument as [[pipeSplit]]'s salted-hash holdout. Position is
    * per (band, shard): a trainer reads bands in order, round-robin
    * over shards — no global row_number (a single-task sort at
    * 100 TB) anywhere in the plan.
    */
  val CurriculumShards = 64
  val CurriculumSalt = "curr|"
  val CurriculumCutsE2: Seq[Long] = Seq(438L, 450L, 463L)

  def pipeCurriculum(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val ordHash = s"graft_hash60(concat('$CurriculumSalt', CAST(doc_id AS STRING)))"
    val Seq(c1, c2, c3) = CurriculumCutsE2
    val w = Window.partitionBy("band", "shard").orderBy(col("ord"), col("doc_id"))
    // NO spread: fan-out measured worse here (paired 1.21 -> 1.37)
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast(LongType))
      .withColumn("avg_len_e2",
        expr("100 * (length(text) - (n_tokens - 1)) DIV n_tokens"))
      .select(col("doc_id"),
        when(col("avg_len_e2") <= c1, 1L).when(col("avg_len_e2") <= c2, 2L)
          .when(col("avg_len_e2") <= c3, 3L).otherwise(4L).as("band"),
        expr(s"$ordHash % $CurriculumShards").as("shard"),
        expr(ordHash).as("ord"))
      .withColumn("pos", (row_number().over(w) - 1).cast(LongType))
      .select("doc_id", "band", "shard", "pos")
      .orderBy("doc_id")
  }

  def pipeCurriculumSql: String = {
    val ordHash = graft.functions.Portable.hash60Duck(
      s"CONCAT('$CurriculumSalt', CAST(doc_id AS VARCHAR))")
    val Seq(c1, c2, c3) = CurriculumCutsE2
    s"""WITH q AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
       |    CAST(length(text) - (len(string_split(text,' ')) - 1) AS BIGINT) AS char_sum
       |  FROM documents),
       |b AS (
       |  SELECT doc_id,
       |    CASE WHEN 100 * char_sum // n_tokens <= $c1 THEN 1
       |         WHEN 100 * char_sum // n_tokens <= $c2 THEN 2
       |         WHEN 100 * char_sum // n_tokens <= $c3 THEN 3
       |         ELSE 4 END AS band,
       |    $ordHash % $CurriculumShards AS shard,
       |    $ordHash AS ord
       |  FROM q)
       |SELECT doc_id, CAST(band AS BIGINT) AS band, CAST(shard AS BIGINT) AS shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY band, shard ORDER BY ord, doc_id) - 1 AS BIGINT) AS pos
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /** Split geometry shared by [[pipeSplit]], its oracle, AND the
    * decontamination guard — one source of truth for the salt and the
    * stratum boundaries (a drift between the split and the guard
    * would silently stop reporting genuine eval leakage).
    */
  val SplitSalt = "split|"
  val SplitTrainE4 = 9000L // h_e4 < 9000 → train
  val SplitValE4 = 9500L // 9000 ≤ h_e4 < 9500 → val, else test

  /** Deterministic train/val/test holdout split (90/5/5 by salted hash
    * bucket). The assignment is a pure function of the doc id ALONE —
    * independent of corpus composition — so growing the corpus,
    * re-running, or backfilling NEVER moves an existing doc across the
    * split boundary (the leakage guarantee rank- or rand()-based
    * splits lose: a doc that was ever in test stays in test).
    * Row-local, zero shuffles before the presentation sort;
    * spec-pinned subset-stability property.
    */
  def pipeSplit(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // materialize-once before the presentation sort (r18 plan audit)
    graft.Scratch.cpSorted(Tables.documents(spark, dir)
      .withColumn("h_e4", expr(s"${saltedHash(SplitSalt)} % 10000"))
      .withColumn("split",
        when(col("h_e4") < SplitTrainE4, "train")
          .when(col("h_e4") < SplitValE4, "val")
          .otherwise("test"))
      .selectExpr("doc_id", "split", "h_e4"),
      col("doc_id"))
  }

  def pipeSplitSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, ${saltedHashDuck(SplitSalt)} % 10000 AS h_e4
       |  FROM documents)
       |SELECT doc_id,
       |  CASE WHEN h_e4 < $SplitTrainE4 THEN 'train'
       |       WHEN h_e4 < $SplitValE4 THEN 'val'
       |       ELSE 'test' END AS split,
       |  h_e4
       |FROM h ORDER BY doc_id""".stripMargin

  /** Vocabulary size for [[pipeTokenize]] — bounded by construction,
    * the contract that keeps the id-assignment join a broadcast.
    */
  val TokenizeVocab = 16

  /** The BPE-ish pretokenizer rule — ONE constant with text_tokens
    * (graft.functions.Portable.PretokRe), so the token-count and
    * id-assignment families cannot drift.
    */
  private val PretokRe = graft.functions.Portable.PretokRe

  /** Tokenization to vocabulary ids — the stage that turns filtered
    * text into the integer sequences a trainer consumes: pretokenize
    * (the BPE-ish regex), build a bounded top-V vocabulary by global
    * frequency (count desc, token asc — deterministic at the cut; ids
    * are 1-based frequency ranks), then map each doc's pretokens to
    * ids IN ORDER (OOV → 0, where a production BPE would recurse into
    * subword merges). The id sequence travels as a comma-joined
    * string so the oracle compare stays representation-independent.
    *
    * Scale posture: the vocab pass ends in a TakeOrderedAndProject
    * (per-partition top-V, never a global sort) like [[TextOps]]'s
    * OOV scorer; the id-assignment join is a V-row broadcast; order
    * restores from the exploded position inside the one doc_id
    * rollup (sort_array over per-doc structs — per-doc cost, not a
    * global sort).
    */
  def pipeTokenize(spark: SparkSession, dir: String): DataFrame = {
    // the regex pretokenize + explode feeds TWO consumers (vocab pass
    // and the id-assignment probe) — materialize it once
    val tok = graft.Scratch.cp(Tables.spread(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"),
        posexplode(expr(s"regexp_extract_all(text, '$PretokRe', 0)")).as(Seq("pos", "t"))))
    // Rank WITHOUT a window: the frame is ≤ TokenizeVocab rows by
    // construction, but an unpartitioned row_number() here planned a
    // single-partition WindowExec whose "No Partition Defined"
    // degradation warning buried real signals in every sweep log (a
    // constant PARTITION BY doesn't help — EliminateWindowPartitions
    // folds it back out). Instead: collapse the top-V cut to one
    // sorted array ((c desc, t asc) via the negated-count struct key)
    // and read the 1-based rank off posexplode — same vid assignment,
    // one fewer exchange, zero window machinery.
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(TokenizeVocab)
      .agg(expr("sort_array(collect_list(named_struct('nc', -c, 't', t)))").as("a"))
      .select(posexplode(col("a")).as(Seq("pos", "s")))
      .select(col("s.t").as("vt"), (col("pos") + 1).cast(LongType).as("vid"))
    val ids = tok.join(broadcast(vocab), col("t") === col("vt"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("vid"), lit(0L)).as("id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_pretokens"),
        expr("array_join(transform(array_sort(collect_list(struct(pos, id))), s -> CAST(s.id AS STRING)), ',')")
          .as("ids"))
    graft.Scratch.seal(ids, tok).orderBy("doc_id")
  }

  def pipeTokenizeSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(text, '$PretokRe')) AS t,
       |    generate_subscripts(regexp_extract_all(text, '$PretokRe'), 1) AS pos
       |  FROM documents),
       |vocab AS (
       |  SELECT t AS vt, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, t) AS BIGINT) AS vid
       |  FROM (SELECT t, COUNT(*) AS c FROM tok GROUP BY t
       |        ORDER BY c DESC, t LIMIT $TokenizeVocab)),
       |j AS (
       |  SELECT doc_id, pos, COALESCE(vid, 0) AS id
       |  FROM tok LEFT JOIN vocab ON t = vt)
       |SELECT doc_id, COUNT(*) AS n_pretokens,
       |  STRING_AGG(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Per-source quota shared by [[pipeQuota]] and its oracle. */
  val QuotaCap = 15L

  /** Per-source quota capping — the C4/Gopher-style domain cap: no
    * single provenance may contribute more than `QuotaCap` docs, and
    * within a source the LONGEST docs win (length as the quality
    * proxy; ties break by doc_id). The complement of [[pipeMix]]'s
    * weighting: mix sets how much of a source the run WANTS, the
    * quota bounds how much any source CAN flood in.
    *
    * Scale posture: one window shuffle keyed by source — but the
    * rank<=k filter directly above the window lets Spark plan a
    * WindowGroupLimit BELOW the exchange (per-partition top-k per
    * source), so a mega-domain ships at most cap×partitions rows,
    * never its full row count. Parallelism = source count, which at
    * crawl scale is millions — never a hot single reducer.
    */
  def pipeQuota(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= QuotaCap)
      .select("doc_id", "source", "n_chars", "rnk")
      .orderBy("doc_id")
  }

  def pipeQuotaSql: String =
    s"""SELECT doc_id, source, n_chars, rnk FROM (
       |  SELECT doc_id, source, n_chars,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
       |  FROM documents) t
       |WHERE rnk <= $QuotaCap
       |ORDER BY doc_id""".stripMargin

  /** Eval decontamination — the stage that keeps benchmark answers
    * out of the training set: any TRAIN doc that is a near-duplicate
    * (the dedup_ngram detector: df-capped 3-gram Jaccard ≥ 0.30) of a
    * HELD-OUT doc ([[pipeSplit]]'s val+test strata, h_e4 ≥ 9000) is
    * reported as (train_id, eval_id) for removal. Both-eval pairs are
    * not contamination and are excluded.
    *
    * Scale posture: composes the ngram pair graph (already
    * LSH/df-cap-bounded) with the split assignment as a PURE HASH
    * FUNCTION of each pair side — zero extra joins, zero extra
    * shuffles beyond the detector's own.
    */
  def pipeDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    def isEval(id: String): String =
      s"graft_hash60(concat('$SplitSalt', CAST($id AS STRING))) % 10000 >= $SplitTrainE4"
    TextOps.ngramPairs(spark, dir)
      .withColumn("a_eval", expr(isEval("a_id")))
      .withColumn("b_eval", expr(isEval("b_id")))
      .filter(col("a_eval") =!= col("b_eval"))
      .select(
        when(col("a_eval"), col("b_id")).otherwise(col("a_id")).as("train_id"),
        when(col("a_eval"), col("a_id")).otherwise(col("b_id")).as("eval_id"),
        col("jac_e4"))
      .orderBy("train_id", "eval_id")
  }

  /** The ASYMMETRIC decontaminate — the shape a real 100 TB run uses.
    * Eval sets (benchmark suites) are tiny next to the training
    * corpus, so instead of the symmetric detector's self-join the
    * eval side's shingles are BROADCAST and the train side is joined
    * against them once: the train corpus never self-joins, never
    * shuffles its shingle frame against itself, and the only
    * aggregation is over (train, eval) candidate hits. Same detector
    * semantics — the df-cap stays CORPUS-WIDE (train ∪ eval, shared
    * via [[TextOps.cappedShingles]]) and the Jaccard is computed from
    * the same per-doc set sizes — so the output rows are identical to
    * [[pipeDecontaminate]] (same DuckDB oracle; PipelineOpsSpec also
    * asserts the BroadcastExchange plan shape).
    */
  def pipeDecontaminateAsym(spark: SparkSession, dir: String): DataFrame = {
    val (pairs, capped) = pipeDecontaminateAsymUnsealed(spark, dir)
    graft.Scratch.seal(pairs, capped)
  }

  /** The asym plan BEFORE Scratch seals it (sealing checkpoints the
    * result, erasing the plan) — the spec asserts the
    * BroadcastExchange shape on this frame. Callers own the returned
    * scratch frame's lifetime.
    */
  private[graft] def pipeDecontaminateAsymUnsealed(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val isEval = expr(
      s"graft_hash60(concat('$SplitSalt', CAST(doc_id AS STRING))) % 10000 >= $SplitTrainE4")
    val capped = TextOps.cappedShingles(spark, dir)
    val evalSh = capped.filter(isEval)
    val trainSh = capped.filter(!isEval)
    val counts = capped.groupBy("doc_id").agg(count(lit(1)).cast(LongType).as("n_sh"))
    val shared = trainSh.as("t").join(broadcast(evalSh.as("e")), col("t.h") === col("e.h"))
      .groupBy(col("t.doc_id").as("train_id"), col("e.doc_id").as("eval_id"))
      .agg(count(lit(1)).cast(LongType).as("shared"))
    val evalCounts = counts.filter(isEval)
      .withColumnRenamed("doc_id", "eval_id").withColumnRenamed("n_sh", "nb")
    val pairs = shared
      .join(counts.withColumnRenamed("doc_id", "train_id").withColumnRenamed("n_sh", "na"), "train_id")
      .join(broadcast(evalCounts), "eval_id")
      .withColumn("jac_e4", expr("10000 * shared DIV (na + nb - shared)"))
      .filter(col("jac_e4") >= 3000)
      .select("train_id", "eval_id", "jac_e4")
      .orderBy("train_id", "eval_id")
    (pairs, capped)
  }

  def pipeDecontaminateSql: String = {
    def isEval(id: String): String =
      graft.functions.Portable.hash60Duck(s"CONCAT('$SplitSalt', CAST($id AS VARCHAR))") +
        s" % 10000 >= $SplitTrainE4"
    s"""WITH ${TextOps.ngramPairsSqlCtes},
       |d AS (
       |  SELECT a_id, b_id, jac_e4,
       |    ${isEval("a_id")} AS ae, ${isEval("b_id")} AS be
       |  FROM np)
       |SELECT CASE WHEN ae THEN b_id ELSE a_id END AS train_id,
       |       CASE WHEN ae THEN a_id ELSE b_id END AS eval_id,
       |       jac_e4
       |FROM d WHERE ae != be
       |ORDER BY train_id, eval_id""".stripMargin
  }

  /** Sliding-window chunking — the context-window segmentation step
    * that turns variable-length documents into fixed-size training
    * windows with overlap (chunk i covers tokens
    * [i·[[ChunkStride]], i·[[ChunkStride]] + [[ChunkW]])): every
    * token lands in ≥1 chunk, consecutive chunks share
    * [[ChunkW]] − [[ChunkStride]] tokens so no training example ever
    * splits a span across an unseen boundary. Start positions are a
    * pure function of the token count, so chunking is reproducible
    * and subset-stable.
    *
    * Scale posture: split + sequence + explode are all row-local —
    * ZERO shuffles before the presentation sort; output volume is
    * ≈ (W/stride)× the corpus (the overlap's own cost, 1.33× at the
    * default geometry), and a mega-document fans out to its own
    * chunks without ever assembling them on one row.
    */
  val ChunkW = 32
  val ChunkStride = 24

  def pipeChunk(spark: SparkSession, dir: String): DataFrame =
    // materialize-once before the presentation sort (r18 plan audit)
    graft.Scratch.cpSorted(Tables.spread(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast(LongType))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast((n - 1) div $ChunkStride as int)), " +
          s"i -> slice(toks, i * $ChunkStride + 1, $ChunkW))"))
        .as(Seq("chunk_idx", "chunk_toks")))
      .select(col("doc_id"), col("chunk_idx").cast(LongType).as("chunk_idx"),
        size(col("chunk_toks")).cast(LongType).as("chunk_tokens"),
        array_join(col("chunk_toks"), " ").as("chunk")),
      col("doc_id"), col("chunk_idx"))

  def pipeChunkSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |    len(string_split(text, ' ')) AS n
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, unnest([{'ci': i, 'ch': toks[i * $ChunkStride + 1 : i * $ChunkStride + $ChunkW]}
       |    for i in generate_series(0, (n - 1) // $ChunkStride)]) AS u
       |  FROM t)
       |SELECT doc_id, CAST(u.ci AS BIGINT) AS chunk_idx,
       |  CAST(len(u.ch) AS BIGINT) AS chunk_tokens,
       |  array_to_string(u.ch, ' ') AS chunk
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_chunk" -> (pipeChunk _),
    "pipe_decontaminate" -> (pipeDecontaminate _),
    "pipe_decontam_asym" -> (pipeDecontaminateAsym _),
    "pipe_sample" -> (pipeSample _),
    "pipe_pack" -> (pipePack _),
    "pipe_mix" -> (pipeMix _),
    "pipe_quota" -> (pipeQuota _),
    "pipe_tokenize" -> (pipeTokenize _),
    "pipe_shuffle" -> (pipeShuffle _),
    "pipe_curriculum" -> (pipeCurriculum _),
    "pipe_split" -> (pipeSplit _))

  def oracles: Map[String, String] = Map(
    "pipe_chunk" -> pipeChunkSql,
    "pipe_decontaminate" -> pipeDecontaminateSql,
    // the asym plan answers the SAME oracle as the symmetric detector
    // — identical rows, different (broadcast) dataflow
    "pipe_decontam_asym" -> pipeDecontaminateSql,
    "pipe_sample" -> pipeSampleSql,
    "pipe_pack" -> pipePackSql,
    "pipe_mix" -> pipeMixSql,
    "pipe_quota" -> pipeQuotaSql,
    "pipe_tokenize" -> pipeTokenizeSql,
    "pipe_shuffle" -> pipeShuffleSql,
    "pipe_curriculum" -> pipeCurriculumSql,
    "pipe_split" -> pipeSplitSql)
}
