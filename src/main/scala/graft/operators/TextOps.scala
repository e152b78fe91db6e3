package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis + near-duplicate operators for large-scale training
  * data pipelines (SURVEY.md §2 "LLM-data-pipeline"), over the
  * `documents` table.
  *
  * Scale posture: every per-document signature (tokens, quality,
  * minhash, simhash, fingerprint) is computed ROW-LOCALLY with
  * codegen'd higher-order functions — zero shuffles until a join is
  * genuinely required to produce pairs, and every pair join is
  * LSH-band/bucket-bounded, never a cross join. Hash functions are
  * the portable 60-bit md5 prefix (the native graft.functions.Hash60
  * expression) so the DuckDB oracle reproduces signatures
  * bit-for-bit.
  */
object TextOps {

  /** Spark SQL expression text for the portable 60-bit hash — the
    * native Hash60 expression (bit-identical to the md5-hex
    * formulation the oracle uses; see graft.functions.Hash60).
    * Callers must GraftFunctions.register first.
    */
  private def hx(x: String): String = s"graft_hash60($x)"

  /** Element-wise hash of an array<string> expression — the native
    * Hash60All expression (a `transform(arr, s -> hash(s))` lambda
    * would interpret-dispatch per element; this is the signature
    * builds' hot loop).
    */
  private def hxAll(x: String): String = s"graft_hash60_all($x)"

  /** DuckDB rendering of the same hash (canonical form in Portable). */
  private def hxDuck(x: String): String =
    graft.functions.Portable.hash60Duck(x)

  /** w-token shingles of the space-tokenized text, as a Spark SQL
    * expression producing array<string>. Short docs yield one partial
    * shingle (same rule on the oracle side).
    */
  private[graft] def shinglesExpr(w: Int): String =
    shinglesOfExpr(w, "split(text,' ')")

  /** Shingles over an arbitrary array<string> expression. When the
    * token array is a COLUMN (not a sub-expression), the lambda slices
    * it directly — inside an interpreted higher-order lambda a
    * sub-expression like `split(text)` re-evaluates PER ELEMENT
    * (no common-subexpression elimination there), turning an O(n)
    * shingle pass into O(n²) per doc.
    */
  private[graft] def shinglesOfExpr(w: Int, toks: String): String =
    s"transform(sequence(0, greatest(size($toks) - $w, 0)), " +
      s"i -> concat_ws(' ', slice($toks, i + 1, $w)))"

  /** DuckDB shingle list over a tokens expression `t`. */
  private def shinglesDuck(w: Int, t: String = "string_split(text,' ')"): String =
    s"[array_to_string($t[i:i+${w - 1}], ' ') " +
      s"for i in generate_series(1, greatest(len($t) - ${w - 1}, 1))]"

  // ---------------------------------------------------------------- text

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (letter runs / digit runs / single punctuation, the shape of a
    * byte-pair pre-tokenizer split). Pure per-row column arithmetic.
    */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    // materialize-once before the presentation sort (r18 plan audit:
    // the sort's sample pass re-ran the pretokenizer regex per doc)
    // NO spread: sf1 flat (1.66 -> 1.59) and sf0.1 isolated worse
    // (0.35 -> 0.83) — body too light to beat the fan-out exchange
    graft.Scratch.cpSorted(Tables.documents(spark, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("ws_tokens"),
      size(expr(s"regexp_extract_all(text, '${graft.functions.Portable.PretokRe}', 0)"))
        .cast(LongType).as("re_tokens"),
      length(col("text")).cast(LongType).as("n_chars_calc")),
      col("doc_id"))

  def textTokensSql: String =
    s"""SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '${graft.functions.Portable.PretokRe}')) AS BIGINT) AS re_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars_calc
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: length, stopword ratio, mean token length —
    * fixed-point integers (no doubles cross the oracle). The bucket
    * rule is the usual "keep mid-length prose with sane stopword
    * density" heuristic.
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    // materialize-once before the presentation sort (r18 plan audit)
    // NO spread: sf0.1 isolated worse (0.33 -> 0.78) for a small sf1
    // gain — under the fan-out's breakeven
    graft.Scratch.cpSorted(Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast(LongType))
      .withColumn("n_stop",
        size(expr("filter(split(text,' '), t -> t = 'the' OR t = 'a')")).cast(LongType))
      .withColumn("char_sum", (length(col("text")) - (col("n_tokens") - 1)).cast(LongType))
      .select(
        col("doc_id"), col("n_tokens"),
        expr("10000 * n_stop DIV n_tokens").as("stop_e4"),
        expr("100 * char_sum DIV n_tokens").as("avg_len_e2"),
        when(col("n_tokens").between(30, 400) &&
          expr("10000 * n_stop DIV n_tokens").between(100, 3000), "good")
          .otherwise("low").as("bucket")),
      col("doc_id"))

  def textQualitySql: String =
    """WITH q AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_filter(string_split(text,' '), t -> t = 'the' OR t = 'a')) AS BIGINT) AS n_stop,
      |    CAST(length(text) - (len(string_split(text,' ')) - 1) AS BIGINT) AS char_sum
      |  FROM documents)
      |SELECT doc_id, n_tokens,
      |  10000 * n_stop // n_tokens AS stop_e4,
      |  100 * char_sum // n_tokens AS avg_len_e2,
      |  CASE WHEN n_tokens BETWEEN 30 AND 400
      |        AND 10000 * n_stop // n_tokens BETWEEN 100 AND 3000
      |       THEN 'good' ELSE 'low' END AS bucket
      |FROM q ORDER BY doc_id""".stripMargin

  /** Lexical diversity (type-token ratio) — the "fraction of unique
    * words" quality signal the Gopher/Dolma-style filters apply next
    * to length and stopword density: template-generated or looping
    * text scores low, natural prose high. Fixed-point e4 ratio
    * (types×10000 div tokens — both counts positive, so truncating
    * and flooring division agree); row-local array ops, no shuffle.
    */
  def textTtr(spark: SparkSession, dir: String): DataFrame =
    // materialize-once before the presentation sort (r18 plan audit)
    // NO spread: body too light, fan-out measured worse (paired 1.13 -> 1.29)
    graft.Scratch.cpSorted(Tables.documents(spark, dir)
      .withColumn("n_types",
        size(expr("array_distinct(split(text, ' '))")).cast(LongType))
      .withColumn("n_tokens", size(split(col("text"), " ")).cast(LongType))
      .select(col("doc_id"), col("n_types"), col("n_tokens"),
        expr("10000 * n_types DIV n_tokens").as("ttr_e4")),
      col("doc_id"))

  def textTtrSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT doc_id, n_types, n_tokens,
      |  10000 * n_types // n_tokens AS ttr_e4
      |FROM t ORDER BY doc_id""".stripMargin

  /** Language-ID by marker-token profiles (the n-gram-heuristic shape:
    * score each language profile by marker hits, argmax with a fixed
    * tie-break order). Profiles are drawn from the corpus vocabulary.
    */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    def cnt(markers: Seq[String]): Column = {
      val list = markers.map(m => s"'$m'").mkString(", ")
      size(expr(s"filter(split(text,' '), t -> t IN ($list))")).cast(LongType)
    }
    // materialize-once before the presentation sort (r18 plan audit)
    graft.Scratch.cpSorted(Tables.spread(Tables.documents(spark, dir), "doc_id")
      .withColumn("c_sql", cnt(Seq("table", "scan", "join", "query", "filter")))
      .withColumn("c_stream", cnt(Seq("stream", "batch", "window", "spark")))
      .withColumn("c_ml", cnt(Seq("vector", "data", "group", "value")))
      .select(
        col("doc_id"),
        when(col("c_sql") >= col("c_stream") && col("c_sql") >= col("c_ml"), "sqlish")
          .when(col("c_stream") >= col("c_ml"), "streamish")
          .otherwise("mlish").as("lang_pred"),
        col("c_sql"), col("c_stream"), col("c_ml")),
      col("doc_id"))
  }

  def textLangidSql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text,' '), t -> t IN ('table','scan','join','query','filter'))) AS BIGINT) AS c_sql,
      |    CAST(len(list_filter(string_split(text,' '), t -> t IN ('stream','batch','window','spark'))) AS BIGINT) AS c_stream,
      |    CAST(len(list_filter(string_split(text,' '), t -> t IN ('vector','data','group','value'))) AS BIGINT) AS c_ml
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN c_sql >= c_stream AND c_sql >= c_ml THEN 'sqlish'
      |       WHEN c_stream >= c_ml THEN 'streamish'
      |       ELSE 'mlish' END AS lang_pred,
      |  c_sql, c_stream, c_ml
      |FROM c ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: a content hash plus an order-insensitive
    * shingle fingerprint (XOR-fold of distinct 5-gram shingle hashes —
    * the rolling-hash family, stable under shingle reordering). Both
    * row-local, zero shuffle; the hash + fold run as native codegen
    * expressions (the interpreted `aggregate(...)` lambda chain they
    * replace dominated this query's cost).
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // materialize-once before the presentation sort (r18 plan audit:
    // the sort's sample pass re-ran the shingle hash+fold body)
    graft.Scratch.cpSorted(
      Tables.documents(spark, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          expr(hx("text")).as("fp_content"),
          expr(s"graft_xorfold(${hxAll(s"array_distinct(${shinglesOfExpr(5, "toks")})")})")
            .as("fp_shingle")),
      col("doc_id"))
  }

  def textFingerprintSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, ${hxDuck("text")} AS fp_content,
       |    list_distinct(${shinglesDuck(5)}) AS shingles
       |  FROM documents),
       |x AS (SELECT doc_id, fp_content, unnest(shingles) AS s FROM sh)
       |SELECT doc_id, ANY_VALUE(fp_content) AS fp_content,
       |  bit_xor(${hxDuck("s")}) AS fp_shingle
       |FROM x GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Text normalization: lowercase, trim, collapse whitespace runs —
    * the canonical pre-dedup cleanup. Output carries the normalized
    * text's hash (not the text itself) so the check stays compact.
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // materialize-once before the presentation sort (r18 plan audit)
    graft.Scratch.cpSorted(Tables.spread(Tables.documents(spark, dir), "doc_id")
      .withColumn("norm", regexp_replace(trim(lower(col("text"))), " +", " "))
      .select(
        col("doc_id"),
        expr(hx("norm")).as("norm_hash"),
        length(col("norm")).cast(LongType).as("norm_len")),
      col("doc_id"))
  }

  def textNormalizeSql: String =
    s"""WITH n AS (
       |  SELECT doc_id, regexp_replace(trim(lower(text)), ' +', ' ', 'g') AS norm
       |  FROM documents)
       |SELECT doc_id, ${hxDuck("norm")} AS norm_hash,
       |  CAST(length(norm) AS BIGINT) AS norm_len
       |FROM n ORDER BY doc_id""".stripMargin

  /** PII scrubbing: redact emails, phone numbers and long ID digit
    * runs — the standard pre-training privacy pass. The corpus'
    * synthetic prose carries no PII, so each doc gets a deterministic
    * contact tail synthesized from doc_id (like the wide entity's
    * payload synth, it exists only in the gate; production text
    * arrives dirty) — the regex pipeline, its ordering (emails before
    * phones before bare ID runs: each stage must not see the previous
    * stage's digits) and the counts are the real operator. Row-local,
    * zero shuffle; patterns stay in the RE2-compatible subset (no
    * lookaround, no backrefs) so Java and DuckDB agree match-for-match.
    */
  private val PiiEmail = "[a-z0-9._%+-]+@[a-z0-9.-]+"
  private val PiiPhone = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val PiiIdRun = "[0-9]{7,}"

  /** The scrub pipeline with its intermediates — [[textPii]] projects
    * the gate columns off it; tests assert the no-leftover property on
    * the `scrubbed` column DIRECTLY (not on a re-derived copy).
    */
  def textPiiScrubbed(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir), "doc_id")
      .withColumn("raw", concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@mail.example.com or +1-202-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ref "), (col("doc_id") + lit(10000000L)).cast("string")))
      .withColumn("s1", regexp_replace(col("raw"), PiiEmail, "<EMAIL>"))
      .withColumn("s2", regexp_replace(col("s1"), PiiPhone, "<PHONE>"))
      .withColumn("scrubbed", regexp_replace(col("s2"), PiiIdRun, "<ID>"))

  def textPii(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // inside a SQL string literal the parser consumes one level of
    // backslash escaping — double it for the expr()-embedded copies
    val phoneSql = PiiPhone.replace("\\", "\\\\")
    // materialize-once before the presentation sort (r18 plan audit:
    // the sort's sample pass re-ran the whole regex scrub chain)
    graft.Scratch.cpSorted(
      textPiiScrubbed(spark, dir)
        .select(
          col("doc_id"),
          expr(hx("scrubbed")).as("pii_hash"),
          size(expr(s"regexp_extract_all(raw, '$PiiEmail', 0)")).cast(LongType).as("n_emails"),
          size(expr(s"regexp_extract_all(raw, '$phoneSql', 0)")).cast(LongType).as("n_phones"),
          size(expr(s"regexp_extract_all(s2, '$PiiIdRun', 0)")).cast(LongType).as("n_ids"),
          length(col("scrubbed")).cast(LongType).as("scrubbed_len")),
      col("doc_id"))
  }

  def textPiiSql: String =
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@mail.example.com or +1-202-555-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ref ' || (10000000 + doc_id) AS raw
       |  FROM documents),
       |s1 AS (SELECT doc_id, raw, regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g') AS s FROM raw),
       |s2 AS (SELECT doc_id, raw, regexp_replace(s, '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS s FROM s1),
       |s3 AS (SELECT doc_id, raw, s, regexp_replace(s, '[0-9]{7,}', '<ID>', 'g') AS scrubbed FROM s2)
       |SELECT doc_id, ${hxDuck("scrubbed")} AS pii_hash,
       |  CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(raw, '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(s, '[0-9]{7,}')) AS BIGINT) AS n_ids,
       |  CAST(length(scrubbed) AS BIGINT) AS scrubbed_len
       |FROM s3 ORDER BY doc_id""".stripMargin

  /** Repetition-based quality signals — the Gopher-style repetition
    * filter family, adapted to the corpus' single-line prose:
    *
    *   - `ttr_e4`   type-token ratio (distinct tokens / tokens)
    *   - `top2_e4`  occurrence share of the single most frequent
    *                bigram (high = the doc loops on one phrase)
    *   - `max_run`  longest run of the SAME token repeated
    *                consecutively ("buy buy buy buy")
    *
    * All three are computed ROW-LOCALLY: the mode-bigram count is the
    * longest equal-adjacent run of the doc's SORTED bigram list (sort
    * groups equal bigrams; no explode, no shuffle), max_run is the
    * same fold over the unsorted tokens — both as the native codegen
    * `graft_maxrun` (an interpreted `aggregate` lambda fold here cost
    * ~9 s at sf0.1; the primitive loop is sub-second). The bigram
    * COUNT needs no shingle pass at all: it is max(n_tokens − 1, 1)
    * by the shingling rule. O(n log n) per doc, zero exchanges before
    * the presentation sort — the only shape that survives a 100 TB
    * quality sweep. The cut rule mirrors the usual production
    * setting: repeated-phrase docs and low-diversity docs are
    * dropped.
    */
  private[graft] def textRepetitionScored(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.spread(Tables.documents(spark, dir), "doc_id")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast(LongType))
      .withColumn("n_bigrams",
        greatest(col("n_tokens") - 1, lit(1)).cast(LongType))
      .withColumn("top2_cnt",
        expr(s"graft_maxrun(array_sort(${shinglesOfExpr(2, "toks")}))"))
      .withColumn("max_run", expr("graft_maxrun(toks)"))
      .select(
        col("doc_id"), col("n_tokens"),
        expr("10000 * n_distinct DIV n_tokens").as("ttr_e4"),
        expr("10000 * top2_cnt DIV n_bigrams").as("top2_e4"),
        col("max_run"),
        when(expr("10000 * n_distinct DIV n_tokens") >= 1000 &&
          expr("10000 * top2_cnt DIV n_bigrams") <= 2500 &&
          col("max_run") <= 3, "keep").otherwise("cut").as("bucket"))
  }

  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // materialize-once before the presentation sort (r18 plan audit:
    // the sort's sample pass re-ran the sort+maxrun folds per doc)
    graft.Scratch.cpSorted(textRepetitionScored(spark, dir), col("doc_id"))
  }

  /** Oracle: the mode-bigram count and the max token run both render
    * as gaps-and-islands (position − rank over equal values = island
    * id) — the standard SQL form of the run-length fold Spark does
    * row-locally.
    */
  def textRepetitionSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |base AS (
       |  SELECT doc_id,
       |    CAST(len(t) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
       |    CAST(len(${shinglesDuck(2, "t")}) AS BIGINT) AS n_bigrams
       |  FROM toks),
       |bg AS (
       |  SELECT doc_id, unnest(${shinglesDuck(2, "t")}) AS b FROM toks),
       |top2 AS (
       |  SELECT doc_id, MAX(c) AS top2_cnt FROM (
       |    SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b) t
       |  GROUP BY doc_id),
       |tk AS (
       |  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
       |runs AS (
       |  SELECT doc_id, CAST(MAX(rl) AS BIGINT) AS max_run FROM (
       |    SELECT doc_id, COUNT(*) AS rl FROM (
       |      SELECT doc_id, w, i,
       |        i - ROW_NUMBER() OVER (PARTITION BY doc_id, w ORDER BY i) AS isl
       |      FROM tk) g
       |    GROUP BY doc_id, w, isl) m
       |  GROUP BY doc_id)
       |SELECT base.doc_id, n_tokens,
       |  10000 * n_distinct // n_tokens AS ttr_e4,
       |  10000 * top2_cnt // n_bigrams AS top2_e4,
       |  max_run,
       |  CASE WHEN 10000 * n_distinct // n_tokens >= 1000
       |        AND 10000 * top2_cnt // n_bigrams <= 2500
       |        AND max_run <= 3
       |       THEN 'keep' ELSE 'cut' END AS bucket
       |FROM base
       |JOIN top2 ON top2.doc_id = base.doc_id
       |JOIN runs ON runs.doc_id = base.doc_id
       |ORDER BY base.doc_id""".stripMargin

  /** Vocabulary size for [[textOov]]: BOUNDED by construction — the
    * scale contract that justifies the broadcast below.
    */
  private val OovVocab = 16

  /** Out-of-vocabulary quality scoring: build a bounded top-V
    * vocabulary by global token frequency (count desc, token asc —
    * deterministic at the cut), then score each doc by its OOV token
    * share. Two passes over the corpus: the vocab pass ends in a
    * TakeOrderedAndProject (per-partition top-V, merged — never a
    * global sort), and the scoring pass joins exploded tokens against
    * the V-row vocab — force-broadcast, bounded by construction like
    * the IVF centroid dim. One doc_id shuffle for the final rollup.
    */
  def textOov(spark: SparkSession, dir: String): DataFrame = {
    // NO spread: fan-out measured worse here (paired 2.28 -> 2.43)
    def tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(OovVocab)
      .select(col("t").as("vt"))
    tok.join(broadcast(vocab), col("t") === col("vt"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_tokens"),
        sum(when(col("vt").isNull, 1L).otherwise(0L)).cast(LongType).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        expr("10000 * n_oov DIV n_tokens").as("oov_e4"))
      .orderBy("doc_id")
  }

  def textOovSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
       |vocab AS (SELECT t AS vt FROM (SELECT t, count(*) AS c FROM tok GROUP BY t ORDER BY c DESC, t LIMIT $OovVocab)),
       |j AS (SELECT doc_id, vt FROM tok LEFT JOIN vocab ON t = vt)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |  CAST(SUM(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  10000 * CAST(SUM(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) // COUNT(*) AS oov_e4
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Bigram-LM fluency scoring — the n-gram-model quality filter: a
    * doc scores by the share of its bigrams that are "known" (carry at
    * least 0.1% of the corpus' total bigram mass). The RELATIVE
    * threshold makes the model scale-invariant AND bounds it
    * mathematically: at most 1000 bigrams can each hold ≥ 1/1000 of
    * the mass, so the model side of the scoring join is a ≤ 1000-row
    * broadcast BY CONSTRUCTION — the unbounded-vocabulary counterpart
    * of [[textOov]]'s fixed top-V cut. Model build is one shuffled
    * bigram groupBy; scoring is broadcast-join + one doc_id rollup.
    */
  def textBigram(spark: SparkSession, dir: String): DataFrame = {
    // the exploded bigram frame feeds THREE consumers (mass total,
    // model build, scoring join) — materialize it once
    val bg = graft.Scratch.cp(Tables.spread(Tables.documents(spark, dir), "doc_id")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(shinglesOfExpr(2, "toks"))).as("b")))
    val total = bg.agg(count(lit(1)).as("nb"))
    val model = bg.groupBy("b").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(total)) // one row
      .filter(col("c") * 1000 >= col("nb"))
      .select(col("b"), lit(1L).as("hit"))
    val scored = bg.join(broadcast(model), Seq("b"), "left") // ≤ 1000 rows by construction
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        sum(coalesce(col("hit"), lit(0L))).cast(LongType).as("n_known"))
      .select(col("doc_id"), col("n_bigrams"), col("n_known"),
        expr("10000 * n_known DIV n_bigrams").as("fluency_e4"))
    graft.Scratch.seal(scored, bg).orderBy("doc_id")
  }

  def textBigramSql: String =
    s"""WITH bg AS (SELECT doc_id, unnest(${shinglesDuck(2)}) AS b FROM documents),
      |model AS (SELECT b FROM bg GROUP BY b
      |          HAVING COUNT(*) * 1000 >= (SELECT COUNT(*) FROM bg)),
      |j AS (SELECT bg.doc_id, CASE WHEN model.b IS NULL THEN 0 ELSE 1 END AS hit
      |      FROM bg LEFT JOIN model ON bg.b = model.b)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(hit) AS BIGINT) AS n_known,
      |  10000 * CAST(SUM(hit) AS BIGINT) // COUNT(*) AS fluency_e4
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Salient terms per doc. */
  private[graft] val TfidfK = 5

  /** TF-IDF salient-term extraction — the "what is this doc about"
    * signal for topic-aware mixing/quota and near-dup triage: each
    * doc's top-[[TfidfK]] terms by tf × rarity. The rarity weight is
    * the LOG-FREE Robertson–Sparck-Jones odds (N - df + ½)/(df + ½) —
    * monotone in the usual idf, and with both halves doubled it is a
    * pure integer ratio, so the whole score is exact int64 arithmetic
    * on BOTH engines (floor-div; no ln/doubles cross the oracle —
    * ln is the one libm op with no cross-engine rounding guarantee).
    *
    * Scale posture: tf is one (doc, term) groupBy; df reuses that
    * frame with a term groupBy (never re-reads the corpus); scoring
    * is a linear shuffle join on term (the df table is
    * vocabulary-sized — NOT broadcast); the per-doc top-k plans a
    * WindowGroupLimit below the exchange (spec-pinned), so a mega-doc
    * ships k×partitions rows, not its vocabulary.
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val (topk, tf) = textTfidfUnsealed(spark, dir)
    graft.Scratch.seal(topk, tf).orderBy("doc_id", "rnk")
  }

  /** The scored (doc, term, tf, df, score) frame before the per-doc
    * shortlist — factored out so the r17 knob A/B (shipped
    * WindowGroupLimit vs a graft_topk floor prototype) consumes the
    * identical upstream plan. Callers own the returned `tf` scratch.
    */
  private[graft] def textTfidfScored(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // NO spread: sf1 gain marginal (4.62 -> 4.29) and sf0.1 isolated
    // worse (1.42 -> 2.09) — the tf groupBy shuffles right away
    val docs = Tables.documents(spark, dir)
    val tf = graft.Scratch.cp(docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).cast(LongType).as("tf")))
    val nDocs = docs.agg(count(lit(1)).cast(LongType).as("n_docs"))
    val dfT = tf.groupBy("t").agg(count(lit(1)).cast(LongType).as("df"))
      .crossJoin(broadcast(nDocs)) // one row
    // MERGE-pinned (r15 audit): the scaladoc's "df table is NOT
    // broadcast" contract was only conventionally true — at small
    // stats the static planner broadcast the token-scaled tf frame
    // (its checkpoint inherits the pre-explode estimate). The pin
    // makes the vocabulary-join contract structural.
    val scored = tf.join(dfT.hint("merge"), "t")
      .withColumn("score_e6",
        expr("(tf * 1000000 * (2 * n_docs - 2 * df + 1)) DIV (2 * df + 1)"))
    (scored, tf)
  }

  /** The tfidf plan BEFORE Scratch seals it (sealing checkpoints the
    * result, erasing the plan) — the spec asserts the WindowGroupLimit
    * shape on this frame. Callers own the returned scratch frame.
    */
  private[graft] def textTfidfUnsealed(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (scored, tf) = textTfidfScored(spark, dir)
    val w = Window.partitionBy("doc_id").orderBy(col("score_e6").desc, col("t"))
    val topk = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TfidfK)
      .select(col("doc_id"), col("rnk").cast(LongType).as("rnk"),
        col("t").as("term"), col("tf"), col("df"), col("score_e6"))
    (topk, tf)
  }

  def textTfidfSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
       |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
       |dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.t, tf.tf, dfq.df,
       |    (tf.tf * 1000000 * (2 * n.n_docs - 2 * dfq.df + 1)) // (2 * dfq.df + 1) AS score_e6
       |  FROM tf JOIN dfq USING (t) CROSS JOIN n)
       |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, t AS term, tf, df, score_e6 FROM (
       |  SELECT doc_id, t, tf, df, score_e6,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_e6 DESC, t) AS rnk
       |  FROM scored) x
       |WHERE rnk <= $TfidfK ORDER BY doc_id, rnk""".stripMargin

  /** Coverage-curve length. */
  private[graft] val VocabTopK = 100

  /** Vocabulary coverage curve — the tokenizer-sizing question "what
    * vocab size covers X% of the corpus tokens": the top-[[VocabTopK]]
    * terms by frequency with each rank's CUMULATIVE share of ALL
    * corpus tokens (fixed-point e4). [[textOov]] scores docs against a
    * FIXED top-V vocabulary; this measures what V you'd need. Ranking
    * ties break by term (the same (count desc, token) order
    * pipe_tokenize's vocab uses).
    *
    * Scale posture: one token groupBy (linear); the top-K cut is a
    * TakeOrdered (per-partition heads + merge — no global sort); the
    * cumulative window then runs over a ≤ K-row frame — bounded BY
    * CONSTRUCTION, so the single-partition window is constant work,
    * and the corpus-total join is a one-row broadcast.
    */
  def textVocab(spark: SparkSession, dir: String): DataFrame = {
    // NO spread: fan-out measured worse here (paired 1.26 -> 1.46)
    val counts = graft.Scratch.cp(Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).cast(LongType).as("cnt")))
    val total = counts.agg(sum("cnt").cast(LongType).as("total"))
    val top = counts.orderBy(col("cnt").desc, col("t")).limit(VocabTopK)
    // Rank + cumulative share WITHOUT a window: the frame is ≤ K rows
    // by construction, but the unpartitioned rank/cumsum windows here
    // planned single-partition WindowExecs whose "No Partition
    // Defined" degradation warnings buried real signals in every
    // sweep log (a constant PARTITION BY doesn't help —
    // EliminateWindowPartitions folds it back out). Instead: collapse
    // the top-K cut to one sorted array ((cnt desc, t asc) via the
    // negated-count struct key); posexplode gives the 1-based rank and
    // a prefix-slice aggregate gives the running sum — O(K²) = 10⁴
    // adds on ONE row, versus a single-partition exchange + window.
    val curve = top
      .agg(expr("sort_array(collect_list(named_struct('nc', -cnt, 't', t, 'cnt', cnt)))").as("a"))
      .crossJoin(broadcast(total)) // one row each side
      .select(col("a"), col("total"), posexplode(col("a")).as(Seq("pos", "s")))
      .select(
        (col("pos") + 1).cast(LongType).as("rnk"),
        col("s.t").as("term"), col("s.cnt").as("cnt"),
        expr("10000 * aggregate(slice(a, 1, pos + 1), 0L, (acc, x) -> acc + x.cnt) DIV total")
          .as("cum_e4"))
    graft.Scratch.seal(curve, counts).orderBy("rnk")
  }

  def textVocabSql: String =
    s"""WITH tok AS (SELECT unnest(string_split(text,' ')) AS t FROM documents),
       |counts AS (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t),
       |total AS (SELECT SUM(cnt) AS total FROM counts),
       |top AS (SELECT t, cnt FROM counts ORDER BY cnt DESC, t LIMIT $VocabTopK)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, t) AS BIGINT) AS rnk,
       |  t AS term, cnt,
       |  CAST(10000 * SUM(cnt) OVER (ORDER BY cnt DESC, t
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) // total.total AS BIGINT) AS cum_e4
       |FROM top CROSS JOIN total
       |ORDER BY rnk""".stripMargin

  // --------------------------------------------------------------- dedup

  /** Exact dedup: hash-groupBy on the full text, keep the minimum
    * doc_id per group (one shuffle on the 128-bit hash).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    // NO spread here: the md5+partial-agg scan is cheap and the groupBy
    // shuffles only digests — the fan-out exchange measured WORSE
    // (paired sf1 A/B 1.02 -> 1.23)
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).cast(LongType).as("n_copies"))
      .select("keep_id", "n_copies", "text_md5")
      .orderBy("keep_id")

  def dedupExactSql: String =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, md5(text) AS text_md5
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  /** Window width (tokens) for the passage-level exact-substring
    * detector — the published heuristic is "an exact run of ~50
    * characters shared verbatim"; 8 whitespace tokens is that order
    * of magnitude on prose.
    */
  private[graft] val SubstringW = 8

  /** Passage-level EXACT-substring dedup — the fixed-width
    * rolling-window approximation of exact-substring deduplication
    * (a document sharing a verbatim run of [[SubstringW]] tokens with
    * an earlier document is a passage dup; any duplicated passage of
    * ≥ W tokens necessarily shares at least one aligned W-window, so
    * the detector is a SUPERSET of the ≥W-run criterion). Complements
    * the whole-document detectors (minhash/simhash judge global
    * similarity and miss a verbatim paragraph inside an otherwise
    * novel document).
    *
    * Scale shape — the reason this formulation and not a self-join:
    * unlike the pairwise near-dup detectors, NO PAIR IS EVER
    * ENUMERATED. Each distinct window collapses to its earliest owner
    * (min doc_id) in one aggregation, and every occurrence joins that
    * one-row-per-window frame — a boilerplate window shared by a
    * million documents contributes one row per occurrence, never a
    * million-squared candidate set, so no df-cap is needed and total
    * work is linear in corpus token count: exactly two shuffles on
    * the window hash (aggregate + join, the join reusing the
    * aggregate's partitioning) plus the per-doc count shuffle.
    */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    dedupSubstringOf(Tables.documents(spark, dir))
  }

  /** Frame-parametric core of [[dedupSubstring]] — `docs` needs
    * (doc_id, text); caller registers GraftFunctions.
    */
  private[graft] def dedupSubstringOf(docs: DataFrame): DataFrame = {
    // fan out before the window explode (§2.5 — see cappedShinglesOf)
    val wins = Tables.spread(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        explode(expr(s"array_distinct(${shinglesOfExpr(SubstringW, "toks")})")).as("s"))
      .select(col("doc_id"), expr(hx("s")).as("h"))
    val firstSeen = wins.groupBy("h").agg(min("doc_id").as("first_doc"))
    // MERGE-pinned (r14 verdict item 5): firstSeen's size ESTIMATE
    // descends from the window explode, whose row multiplier Catalyst
    // ignores — at intermediate corpus sizes the estimate can sit just
    // under the broadcast threshold while the true distinct-window
    // table is corpus-scaled (the sharded-simhash incident, one hop
    // removed). The hint pins the sort-merge join the scaladoc above
    // already promises (reusing the aggregate's hash partitioning);
    // results are row-identical (PassageGuardSpec) and AQE preserves
    // join hints, so no runtime conversion can re-open the window.
    wins.join(firstSeen.hint("merge"), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_windows"),
        sum(when(col("doc_id") > col("first_doc"), 1L).otherwise(0L)).as("n_dup_windows"),
        max(when(col("doc_id") > col("first_doc"), 1L).otherwise(0L)).as("is_dup"))
      .select("doc_id", "n_windows", "n_dup_windows", "is_dup")
      .orderBy("doc_id")
  }

  def dedupSubstringSql: String =
    s"""WITH w0 AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(${shinglesDuck(SubstringW)})) AS s
       |  FROM documents),
       |w1 AS (SELECT doc_id, ${hxDuck("s")} AS h FROM w0),
       |fs AS (SELECT h, MIN(doc_id) AS first_doc FROM w1 GROUP BY h)
       |SELECT w1.doc_id, COUNT(*) AS n_windows,
       |  CAST(SUM(CASE WHEN w1.doc_id > fs.first_doc THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_windows,
       |  CAST(MAX(CASE WHEN w1.doc_id > fs.first_doc THEN 1 ELSE 0 END) AS BIGINT)
       |    AS is_dup
       |FROM w1 JOIN fs USING (h)
       |GROUP BY w1.doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ winnowing

  /** Winnowing geometry: k-gram width × hash-window width. The
    * guarantee bar t = K + W − 1 = 8 tokens matches [[SubstringW]] —
    * the winnowed index catches the SAME ≥8-token verbatim runs
    * dedup_substring catches with ALL windows.
    */
  private[graft] val WinnowK = 5
  private[graft] val WinnowW = 4

  /** Winnowing fingerprint selection over a bound hash-array column:
    * min per sliding [[WinnowW]]-window, deduped — the native codegen
    * [[graft.functions.WinnowMins]] (O(n) monotonic deque; the
    * declarative `array_distinct(transform(..., array_min(slice(...))))`
    * form it replaces is O(n·w) with a per-window slice allocation
    * inside an interpreted lambda, and is spec-pinned identical).
    */
  private def winnowSelectExpr(hs: String): String =
    s"graft_winnow($hs, $WinnowW)"

  /** The declarative formulation — kept as the spec's cross-check
    * against the native expression (both must select identical sets).
    */
  private[graft] def winnowSelectDeclarative(hs: String): String =
    s"array_distinct(transform(sequence(0, greatest(size($hs) - $WinnowW, 0)), " +
      s"i -> array_min(slice($hs, i + 1, $WinnowW))))"

  /** Per-doc winnowed fingerprint frame (doc_id, fp) — shared by the
    * gate entry and [[dedupWinnow]].
    */
  private[graft] def winnowFps(docs: DataFrame): DataFrame =
    // fan out before the k-gram hash + winnow selection (§2.5 — see
    // cappedShinglesOf)
    Tables.spread(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hs",
        expr(s"graft_hash60_all(${shinglesOfExpr(WinnowK, "toks")})"))
      .select(col("doc_id"), explode(expr(winnowSelectExpr("hs"))).as("fp"))

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS selection rule): hash every
    * [[WinnowK]]-gram, then per sliding window of [[WinnowW]]
    * consecutive hashes keep the window MINIMUM. Two properties make
    * this THE sub-linear passage index: (1) correctness — any verbatim
    * run of ≥ K+W−1 tokens shared by two documents selects at least
    * one common fingerprint (every length-W hash window inside the
    * run is identical in both, and some window's minimum is selected
    * in both); (2) density — expected 2/(W+1) of positions are
    * selected, so the index stores ~40% of the window hashes
    * dedup_substring stores, with the same detection bar. Selection
    * is row-local (one Hash60All batch per doc, then arithmetic over
    * the bound array); only the deduped fingerprints leave the row.
    */
  def textWinnow(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // fingerprints materialize once before the presentation sort — the
    // sort's range-bounds sample pass otherwise re-runs the full
    // shingle-hash + winnow selection a second time (r18 plan audit)
    graft.Scratch.cpSorted(winnowFps(Tables.documents(spark, dir)),
      col("doc_id"), col("fp"))
  }

  private def winnowDuckCte: String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT doc_id,
       |    list_transform(${shinglesDuck(WinnowK, "toks")}, x -> ${hxDuck("x")}) AS hs
       |  FROM t),
       |f AS (SELECT doc_id,
       |    unnest(list_distinct([list_min(hs[i : i + ${WinnowW - 1}])
       |      for i in generate_series(1, greatest(len(hs) - ${WinnowW - 1}, 1))])) AS fp
       |  FROM s)""".stripMargin

  def textWinnowSql: String =
    s"""WITH $winnowDuckCte
       |SELECT doc_id, fp FROM f ORDER BY doc_id, fp""".stripMargin

  /** Passage dedup over the winnowed index — [[dedupSubstring]]'s
    * min-owner aggregation run on ~40% of the rows: each fingerprint
    * collapses to its earliest owner, no pair is ever enumerated, and
    * the ≥ K+W−1-token detection bar is winnowing's guarantee rather
    * than the all-windows construction. The scale trade vs
    * dedup_substring is index size for verdict granularity: is_dup
    * still means "shares a qualifying verbatim run", but
    * n_dup_fps counts selected fingerprints, not all duplicated
    * windows.
    */
  def dedupWinnow(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val fps = winnowFps(Tables.documents(spark, dir))
    val firstSeen = fps.groupBy("fp").agg(min("doc_id").as("first_doc"))
    // MERGE-pinned for the same Generate-underestimate window as
    // dedupSubstringOf (the winnowed index is ~40% of the rows but
    // corpus-scaled all the same)
    fps.join(firstSeen.hint("merge"), "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_fps"),
        sum(when(col("doc_id") > col("first_doc"), 1L).otherwise(0L)).as("n_dup_fps"),
        max(when(col("doc_id") > col("first_doc"), 1L).otherwise(0L)).as("is_dup"))
      .select("doc_id", "n_fps", "n_dup_fps", "is_dup")
      .orderBy("doc_id")
  }

  def dedupWinnowSql: String =
    s"""WITH $winnowDuckCte,
       |fs AS (SELECT fp, MIN(doc_id) AS first_doc FROM f GROUP BY fp)
       |SELECT f.doc_id, COUNT(*) AS n_fps,
       |  CAST(SUM(CASE WHEN f.doc_id > fs.first_doc THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_fps,
       |  CAST(MAX(CASE WHEN f.doc_id > fs.first_doc THEN 1 ELSE 0 END) AS BIGINT)
       |    AS is_dup
       |FROM f JOIN fs USING (fp)
       |GROUP BY f.doc_id ORDER BY doc_id""".stripMargin

  /** INCREMENTAL winnowed passage dedup — [[dedupWinnow]]'s
    * daily-append shape: the day's arrivals probe the EXISTING
    * corpus's winnowed fingerprint index (in production yesterday's
    * precomputed artifact — 40% the rows of the all-windows index,
    * same ≥ K+W−1-token detection bar; the guarantee is pairwise, so
    * "delta doc shares a qualifying run with ANY corpus doc" ⇒ a
    * common selected fingerprint exists). Plan shape and
    * delta-broadcast guard are [[dedupSubstringIncWith]]'s: corpus
    * scanned once, never shuffles raw fingerprint rows, delta rides a
    * size-guarded broadcast, merge-pinned fallback past the ceiling.
    */
  def dedupWinnowInc(spark: SparkSession, dir: String): DataFrame =
    dedupWinnowIncWith(spark, dir, MaxDeltaBroadcastDocs)

  /** Explicit-ceiling variant — the guard spec drives the ceiling to 0
    * to pin the fallback plan row-identical.
    */
  def dedupWinnowIncWith(spark: SparkSession, dir: String,
      maxBroadcastDocs: Long): DataFrame = {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val deltaFits = fitsBound(
      docs.filter(col("doc_id") % 10 === 7).select("doc_id"), maxBroadcastDocs)
    // over-ceiling fallback pins MERGE instead of going hint-free: a
    // hint-free join would let the STATIC planner re-broadcast from
    // the Generate-descended underestimate (AQE only promotes, never
    // demotes) — the exact window the ceiling exists to close
    def hinted(df: DataFrame): DataFrame =
      if (deltaFits) broadcast(df) else df.hint("merge")
    val fps = winnowFps(docs)
    val delta = fps.filter(col("doc_id") % 10 === 7)
    val corpus = fps.filter(col("doc_id") % 10 =!= 7)
    val hits = corpus.join(hinted(delta.select("fp").distinct()), "fp")
      .groupBy("fp").agg(count(lit(1)).as("_c"))
      .select(col("fp"), lit(1L).as("hit"))
    delta.join(hinted(hits), Seq("fp"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_fps"),
        coalesce(sum("hit"), lit(0L)).cast(LongType).as("n_dup_fps"),
        coalesce(max("hit"), lit(0L)).cast(LongType).as("is_dup"))
      .select("doc_id", "n_fps", "n_dup_fps", "is_dup")
      .orderBy("doc_id")
  }

  def dedupWinnowIncSql: String =
    s"""WITH $winnowDuckCte,
       |delta AS (SELECT doc_id, fp FROM f WHERE doc_id % 10 = 7),
       |corpus AS (SELECT doc_id, fp FROM f WHERE doc_id % 10 <> 7),
       |hits AS (
       |  SELECT DISTINCT corpus.fp FROM corpus
       |  JOIN (SELECT DISTINCT fp FROM delta) d ON corpus.fp = d.fp)
       |SELECT delta.doc_id, COUNT(*) AS n_fps,
       |  CAST(SUM(CASE WHEN hits.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_fps,
       |  CAST(MAX(CASE WHEN hits.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS is_dup
       |FROM delta LEFT JOIN hits ON delta.fp = hits.fp
       |GROUP BY delta.doc_id ORDER BY doc_id""".stripMargin

  /** INCREMENTAL passage-level dedup — flag a NEW batch's documents
    * that share a verbatim ≥[[SubstringW]]-token run with the EXISTING
    * corpus, without recomputing the corpus-wide first-seen table:
    * the daily-append sibling of [[dedupSubstring]], exactly as
    * [[dedupIncremental]] is to [[dedupMinhash]]. The delta here is
    * the deterministic doc_id % 10 = 7 slice; in production it is the
    * day's arrivals, and "corpus" membership replaces the full form's
    * doc_id ordering (anything already ingested is earlier by
    * definition).
    *
    * Plan shape (the point): the corpus side is scanned ONCE and
    * NEVER shuffles raw window rows — the delta's distinct window
    * hashes ride a BROADCAST into a hash join against the corpus
    * window stream, and only the MATCHED hashes (≤ the delta's own
    * window count after map-side partial dedup) cross an exchange.
    * Corpus-side cost is linear per ingest, independent of how many
    * corpus docs share a boilerplate window.
    */
  /** (doc_id, h) distinct window hashes of a documents-shaped frame —
    * the shared front half of the passage detectors. Row-local, so it
    * works identically on batch AND streaming frames (the streaming
    * incremental runner derives its delta windows through this same
    * helper; divergence here would split two paths answering one
    * oracle). Caller registers GraftFunctions.
    */
  private[graft] def substringWindows(docs: DataFrame): DataFrame =
    // fan out before the window explode (§2.5 — see cappedShinglesOf)
    Tables.spread(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        explode(expr(s"array_distinct(${shinglesOfExpr(SubstringW, "toks")})")).as("s"))
      .select(col("doc_id"), expr(hx("s")).as("h"))

  /** Delta-side ceiling (in DOCUMENTS) for the incremental detectors'
    * forced-broadcast plans. The incremental forms' whole advantage is
    * that the day's delta rides a broadcast into the corpus scan — but
    * the broadcast frames scale with INGEST size (distinct window
    * hashes / banded signatures of the delta), not with a fixed dim,
    * so a backlogged multi-day delta would turn the hint into a
    * driver/executor OOM. Same contract-enforcement posture as
    * [[VectorOps.MaxBruteforceQueries]]: past the ceiling the plan
    * falls back to hint-free joins (AQE picks the strategy from
    * runtime sizes — a shuffled hash join once the delta really is
    * corpus-scale), which is row-identical under the same oracle.
    * Sizing: ~10^5 docs × ~10^2 distinct windows/doc × 8 B hash ≈
    * 10^8 B of key material — the edge of a comfortable broadcast on
    * a large-executor cluster; the banded-signature frame (4 rows/doc)
    * is far smaller, so one shared ceiling keeps the contract simple.
    */
  val MaxDeltaBroadcastDocs = 100000L

  /** Bounded count: short-circuits once `bound + 1` rows exist, so an
    * over-ceiling delta is detected without a full scan.
    */
  private def fitsBound(df: DataFrame, bound: Long): Boolean = {
    val n =
      if (bound < Int.MaxValue) df.limit(bound.toInt + 1).count()
      else df.count()
    n <= bound
  }

  def dedupSubstringInc(spark: SparkSession, dir: String): DataFrame =
    dedupSubstringIncWith(spark, dir, MaxDeltaBroadcastDocs)

  /** Explicit-ceiling variant — the guard spec drives the ceiling to 0
    * to pin the fallback plan row-identical.
    */
  def dedupSubstringIncWith(spark: SparkSession, dir: String,
      maxBroadcastDocs: Long): DataFrame = {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    // the guard: count delta DOCS (one pushed-down id-column scan with
    // a limit short-circuit), not delta windows — the ceiling is a
    // contract on ingest size, checked before any window explode runs
    val deltaFits = fitsBound(
      docs.filter(col("doc_id") % 10 === 7).select("doc_id"), maxBroadcastDocs)
    // over-ceiling fallback pins MERGE, not hint-free — see
    // dedupWinnowIncWith (the static Generate-underestimate window)
    def hinted(df: DataFrame): DataFrame =
      if (deltaFits) broadcast(df) else df.hint("merge")
    val wins = substringWindows(docs)
    val delta = wins.filter(col("doc_id") % 10 === 7)
    val corpus = wins.filter(col("doc_id") % 10 =!= 7)
    // windows present in BOTH: corpus rows hash-probe the broadcast
    // delta window set; the groupBy's map-side partials bound the
    // shuffle at distinct matched hashes per partition. Past the
    // ceiling both hints drop and AQE plans from runtime sizes.
    val hits = corpus.join(hinted(delta.select("h").distinct()), "h")
      .groupBy("h").agg(count(lit(1)).as("_c")).select(col("h"), lit(1L).as("hit"))
    delta.join(hinted(hits), Seq("h"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_windows"),
        coalesce(sum("hit"), lit(0L)).cast(LongType).as("n_dup_windows"),
        coalesce(max("hit"), lit(0L)).cast(LongType).as("is_dup"))
      .select("doc_id", "n_windows", "n_dup_windows", "is_dup")
      .orderBy("doc_id")
  }

  /** The corpus window-hash index — one row per DISTINCT window hash,
    * `hit = 1` so probes can left-join and sum. This is the static
    * artifact the streaming incremental detector
    * (stream_substring_inc) probes: in production it is yesterday's
    * precomputed parquet, partitioned on `h` so the probe join reuses
    * its layout.
    */
  def windowIndexOf(docs: DataFrame): DataFrame =
    substringWindows(docs).select("h").distinct().withColumn("hit", lit(1L))

  /** Daily index maintenance — APPEND an accepted delta's windows into
    * the existing index without recomputing the corpus: the index's
    * hash set unions with the delta's window hashes and one
    * `distinct()` over the union IS the compaction (one shuffle on
    * `h`, linear in index + delta; the corpus documents are never
    * re-read). Closes the incremental loop: after day N's ingest the
    * appended index is day N+1's static probe side. Merge ≡ recompute
    * — appendWindowIndex(windowIndexOf(corpus), delta) is row-for-row
    * [[windowIndexOf]](corpus ∪ delta) — is spec-pinned, the same bar
    * imp_entity_incremental meets.
    */
  def appendWindowIndex(index: DataFrame, newDocs: DataFrame): DataFrame =
    index.select("h")
      .union(substringWindows(newDocs).select("h"))
      .distinct().withColumn("hit", lit(1L))

  def dedupSubstringIncSql: String =
    s"""WITH w0 AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(${shinglesDuck(SubstringW)})) AS s
       |  FROM documents),
       |w1 AS (SELECT doc_id, ${hxDuck("s")} AS h FROM w0),
       |delta AS (SELECT doc_id, h FROM w1 WHERE doc_id % 10 = 7),
       |corpus_h AS (SELECT DISTINCT h FROM w1 WHERE doc_id % 10 <> 7)
       |SELECT d.doc_id, COUNT(*) AS n_windows,
       |  CAST(SUM(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_windows,
       |  CAST(MAX(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS is_dup
       |FROM delta d LEFT JOIN corpus_h c ON d.h = c.h
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** n-gram Jaccard near-dup: distinct 3-gram shingles, hot-shingle
    * df-cap (document frequency > 100 dropped — the standard guard
    * that keeps the self-join candidate set linear at 100 TB), join
    * on shared shingle, exact Jaccard >= 0.30 in fixed-point.
    */
  def dedupNgram(spark: SparkSession, dir: String): DataFrame =
    ngramPairs(spark, dir).orderBy("a_id", "b_id")

  /** The df-capped distinct-shingle frame (doc_id, h), materialized
    * via Scratch — the shared front half of the near-dup detector,
    * consumed by [[ngramPairs]] and the asymmetric decontaminate.
    * Caller owns the Scratch lifetime (seal results against it).
    * The df counts are CORPUS-WIDE, so every consumer applies the
    * identical hot-shingle cap.
    */
  def cappedShingles(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    cappedShinglesOf(Tables.documents(spark, dir))
  }

  /** Frame-parametric form — the sparse-corpus knob A/B (r17 verdict
    * item 3) drives the identical plan with a synthetic documents
    * frame. Caller registers GraftFunctions.
    */
  private[graft] def cappedShinglesOf(docs: DataFrame): DataFrame = {
    // fan out before the shingle explode — the single-row-group corpus
    // scan otherwise tokenizes+hashes the whole corpus in ONE task
    // (§2.5 input skew); the exchange moves only (doc_id, text)
    val sh = Tables.spread(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        explode(expr(s"array_distinct(${shinglesOfExpr(3, "toks")})")).as("s"))
      .select(col("doc_id"), expr(hx("s")).as("h"))
    // df-cap via a window over the SAME partitioning the self-join
    // needs — the join reuses the hash(h) exchange instead of
    // re-shuffling, and per-doc set sizes broadcast.
    // materialized once: feeds the per-doc counts AND both self-join
    // sides (explode + md5 + the df-cap window would otherwise run 3×)
    graft.Scratch.cp(sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("df") <= 100)
      .select("doc_id", "h"))
  }

  /** The near-dup pair graph (un-sorted, sealed) — consumed by
    * dedupNgram and the decontamination stage.
    */
  def ngramPairs(spark: SparkSession, dir: String): DataFrame =
    ngramPairsOf(cappedShingles(spark, dir))

  /** Pair graph over a caller-supplied capped-shingle frame (consumed
    * and released) — frame-parametric for the sparse-corpus knob A/B.
    */
  private[graft] def ngramPairsOf(capped: DataFrame): DataFrame = {
    val counts = capped.groupBy("doc_id").agg(count(lit(1)).cast(LongType).as("n_sh"))
    // MERGE-pinned (r15 audit): both sides are the corpus's SHINGLE
    // frame — ~hundreds of rows per document — whose checkpoint
    // inherits a document-bytes-scaled estimate that misses the
    // explode multiplier entirely; at small/intermediate stats the
    // static planner chose to broadcast one side (seen at sf0.01),
    // and a just-under-threshold estimate would broadcast ~100× the
    // planned bytes. The h-keyed SMJ also reuses the df-cap window's
    // hash(h) exchange, which is this operator's documented shape.
    val shared = capped.as("a").join(capped.as("b").hint("merge"),
      col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).cast(LongType).as("shared"))
    // counts is one row per document — leave the join strategy to
    // AQE (a forced broadcast would collect the whole corpus's doc
    // list to the driver at scale)
    val pairs = shared
      .join(counts.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "na"), "a_id")
      .join(counts.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
      .withColumn("jac_e4", expr("10000 * shared DIV (na + nb - shared)"))
      .filter(col("jac_e4") >= 3000)
      .select("a_id", "b_id", "jac_e4")
    // result (the near-dup pair list) is tiny next to the capped
    // shingle frame — seal it and release the working set
    graft.Scratch.seal(pairs, capped)
  }

  /** CTE chain ending in `np(a_id, b_id, jac_e4)` — shared by the
    * ngram oracle and the decontamination oracle (ONE rendering of
    * the detector; a hand-rolled copy is how oracle divergence
    * happens).
    */
  def ngramPairsSqlCtes: String =
    s"""sh0 AS (
       |  SELECT doc_id, unnest(list_distinct(${shinglesDuck(3)})) AS s
       |  FROM documents),
       |sh1 AS (SELECT doc_id, ${hxDuck("s")} AS h FROM sh0),
       |hot AS (SELECT h FROM sh1 GROUP BY h HAVING COUNT(*) > 100),
       |sh AS (SELECT * FROM sh1 WHERE h NOT IN (SELECT h FROM hot)),
       |cnts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |np AS (
       |  SELECT a_id, b_id,
       |    10000 * shared // (ca.n_sh + cb.n_sh - shared) AS jac_e4
       |  FROM pairs
       |  JOIN cnts ca ON ca.doc_id = a_id
       |  JOIN cnts cb ON cb.doc_id = b_id
       |  WHERE 10000 * shared // (ca.n_sh + cb.n_sh - shared) >= 3000)""".stripMargin

  def dedupNgramSql: String =
    s"""WITH $ngramPairsSqlCtes
       |SELECT a_id, b_id, jac_e4 FROM np ORDER BY a_id, b_id""".stripMargin

  /** dedup_ngram_prod — the PRODUCTION geometry for the one detector
    * that still self-joins on raw shingles (r16 verdict item 3;
    * precedent: dedup_simhash_prod). A 100 TB corpus never runs the
    * full shingle self-join — even df≤100-capped, the candidate set
    * scales with corpus shingle volume. The production shape is the
    * standard LSH CASCADE:
    *
    *   1. candidates = banded-minhash buckets ([[minhashCandidates]]
    *      — corpus-linear: row-local signatures, bucket equi-join);
    *   2. exact 3-gram Jaccard is verified ONLY on candidate pairs:
    *      the df-capped shingle frame collapses to ONE array row per
    *      doc, the (small) candidate list joins that table twice, and
    *      the intersection is computed ROW-LOCALLY
    *      (`array_intersect`) — no shingle-keyed self-join anywhere.
    *
    * Work is candidates × per-doc set size, not shingles²/df — the
    * exact-verify cost now scales with the DUPLICATE density, which
    * is the quantity a dedup pass is entitled to pay for.
    *
    * Recall trade, stated: the prefilter's signatures ride 5-gram
    * shingles and 4×2 bands (the oracle-pinned minhash geometry), so
    * a pair with 3-gram Jaccard ≥ 0.30 but no shared band bucket is
    * missed — measured at the gate corpus in PLANS.md r17. The gate
    * pins the cascade EXACTLY: oracle = the shared `np` CTE (the full
    * detector's pair graph) restricted to the shared `cand` CTE (the
    * minhash candidate graph) — both engines render both stages from
    * one source of truth, so any divergence in either stage hashes
    * red.
    *
    * The verified scores are identical to [[dedupNgram]]'s for every
    * surviving pair: `size(array_intersect)` equals the self-join's
    * per-pair match count because per-doc capped shingle hashes are
    * distinct by construction (shingle strings are array_distinct'd
    * before hashing), and the denominator uses the same per-doc row
    * counts (array sizes of the same frame).
    */
  def dedupNgramProd(spark: SparkSession, dir: String): DataFrame = {
    // stage 1 — LSH prefilter (already sealed by its own scope)
    val cand = minhashCandidates(spark, dir).select("a_id", "b_id")
    // stage 2 — exact verification on candidates only
    val capped = cappedShingles(spark, dir)
    val sets = capped.groupBy("doc_id")
      .agg(collect_list(col("h")).as("hs"))
    // candidate list is duplicate-density-sized — leave both joins to
    // AQE (it broadcasts the candidate side when it is small, and
    // shuffles on doc_id when a pathological corpus makes it large)
    val verified = cand
      .join(sets.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
      .withColumn("shared",
        size(array_intersect(col("ha"), col("hb"))).cast(LongType))
      .withColumn("jac_e4",
        expr("10000 * shared DIV (size(ha) + size(hb) - shared)"))
      .filter(col("jac_e4") >= 3000)
      .select("a_id", "b_id", "jac_e4")
    graft.Scratch.seal(verified, capped).orderBy("a_id", "b_id")
  }

  def dedupNgramProdSql: String =
    s"""WITH $ngramPairsSqlCtes,
       |$minhashCandidatesSqlCtes
       |SELECT np.a_id, np.b_id, np.jac_e4
       |FROM np JOIN cand ON np.a_id = cand.a_id AND np.b_id = cand.b_id
       |ORDER BY np.a_id, np.b_id""".stripMargin

  /** MinHash + LSH near-dup: k=8 portable min-hashes computed ROW-
    * LOCALLY (array_min over shingle hashes — no explode, no shuffle),
    * banded 4×2, candidates = pairs sharing >= 1 band bucket. Output
    * is the candidate set with its band-agreement count, the exact
    * shape a downstream verify stage consumes.
    */
  private[graft] val MinhashK = 8

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    minhashCandidates(spark, dir).orderBy("a_id", "b_id")

  /** Candidate pair graph (un-sorted) — consumed by dedupMinhash and
    * the component-closure operator.
    */
  def minhashCandidates(spark: SparkSession, dir: String): DataFrame =
    minhashCandidatesWith(spark, dir, bandRows = 2)

  /** Candidate graph with explicit rows-per-band — one of the two
    * minhash scale knobs (LSH theory: match probability per band is
    * j^bandRows for Jaccard j, so more rows per band = stricter
    * candidates = smaller self-join at the cost of recall; fewer rows
    * = provable SUPERSET of candidates, spec-checked). The 2-row
    * default keeps the full oracle.
    */
  def minhashCandidatesWith(spark: SparkSession, dir: String, bandRows: Int): DataFrame =
    minhashCandidatesFullWith(spark, dir, MinhashK, bandRows)

  /** Fully parametric candidate graph — signature length AND
    * rows-per-band explicit, the complete minhash geometry a 100 TB
    * run tunes (e.g. k=128, bandRows=8 → 16 bands with per-band match
    * probability j^8). Signatures come from the native
    * `graft_minhash(arr, k)` expression; coefficient prefixes are
    * shared across k (the first 8 are the oracle-pinned constants),
    * so at fixed bandRows a longer signature's candidate set is a
    * SUPERSET of a shorter one's (its bands are a superset) —
    * spec-checked, which pins the derived coefficients too.
    */
  def minhashCandidatesFullWith(spark: SparkSession, dir: String,
      k: Int, bandRows: Int): DataFrame = {
    GraftFunctions.register(spark)
    minhashCandidatesOf(Tables.documents(spark, dir), k, bandRows)
  }

  /** Candidate graph over a caller-supplied documents frame — the
    * sparse-corpus knob A/B's prefilter stage. Caller registers
    * GraftFunctions.
    */
  private[graft] def minhashCandidatesOf(docs: DataFrame,
      k: Int, bandRows: Int): DataFrame = {
    // sigs + bands materialize once — the self-join consumes this
    // frame on both sides
    val exploded = graft.Scratch.cp(bandedOf(docs, k, bandRows))
    // KNOWN-WINDOW guard: the banded frame is nBands× its Generate
    // estimate (k/bandRows bands per doc) — untouched at adjudicated
    // geometries, merge-pinned past the ceiling (r15 verdict item 5)
    val nBands = (k / bandRows).toLong
    val cand = KnownWindow.guard(exploded, nBands).as("a")
      .join(KnownWindow.guard(exploded, nBands).as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).cast(LongType).as("n_bands"))
    graft.Scratch.seal(cand, exploded)
  }

  /** Salt-split of oversized LSH band buckets — the "full fix" for a
    * pathological corpus where one dominant template collapses into a
    * single hot band bucket (AQE's OptimizeSkewedJoin splits the
    * skewed PARTITION at runtime — spec'd in SaltingSpec — but a
    * single join KEY can also be split ahead of time, bounding the
    * per-reducer work deterministically). The self-join on
    * (band_idx, band_key) becomes a join on (band_idx, band_key,
    * salt): the left side's salt is a pure function of its doc_id
    * (hash % S, so a hot bucket's rows spread across S sub-buckets),
    * the right side replicates each row to ALL S salts — every
    * candidate pair (a < b) still meets on exactly ONE salt (the one
    * a's doc_id hashes to), so the candidate set is IDENTICAL to the
    * unsalted join (spec-pinned row-for-row, plus a one-template
    * stress corpus asserting no sub-bucket exceeds 4× the median).
    * Cost: the replicated side shuffles S×, the standard salted-join
    * trade — a knob to turn ON for template-heavy corpora, not the
    * default (md5-uniform hashes don't need it).
    */
  def minhashCandidatesSaltSplit(spark: SparkSession, dir: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1, s"graft-minhash: saltFactor $saltFactor must be >= 1")
    val exploded = graft.Scratch.cp(bandedFrame(spark, dir, MinhashK, 2))
    // KNOWN-WINDOW guard: banded ×(k/2) bands, replicated further
    // ×saltFactor — the shipped 4×8 sits exactly at the adjudicated
    // ceiling; a raised saltFactor merge-pins (r15 verdict item 5)
    val nBands = (MinhashK / 2).toLong
    val salted = KnownWindow.guard(
      exploded.withColumn("salt", pmod(hash(col("doc_id")), lit(saltFactor))),
      nBands)
    val replicated = KnownWindow.guard(
      exploded.withColumn("salt", explode(expr(s"sequence(0, ${saltFactor - 1})"))),
      nBands * saltFactor)
    val cand = salted.as("a").join(replicated.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.salt") === col("b.salt") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).cast(LongType).as("n_bands"))
    graft.Scratch.seal(cand, exploded)
  }

  /** The banded signature frame (doc_id, band_idx, band_key) every
    * minhash consumer joins on — the full-corpus self-join
    * ([[minhashCandidatesFullWith]]) and the incremental
    * delta-vs-corpus form ([[dedupIncremental]]).
    */
  private def bandedFrame(spark: SparkSession, dir: String,
      k: Int, bandRows: Int): DataFrame = {
    GraftFunctions.register(spark)
    bandedOf(Tables.documents(spark, dir), k, bandRows)
  }

  /** Frame-parametric banded-signature derivation — every step is
    * row-local, so it runs unchanged on a STREAMING documents frame
    * (the stream_minhash_inc delta side); the batch path wraps it
    * with the corpus loader. Caller registers GraftFunctions.
    */
  private[graft] def bandedOf(docs: DataFrame,
      k: Int, bandRows: Int): DataFrame = {
    require(k % bandRows == 0,
      s"graft-minhash: bandRows=$bandRows must divide the signature length $k")
    val nBands = k / bandRows
    // Shingles are md5-hashed ONCE; the k minhash variants are the
    // affine pseudo-permutations (A_i*h + B_i) mod 2^31-1 computed by
    // the native graft_minhash expression (exact in both engines —
    // the oracle renders the same maps in SQL).
    // fan out before the signature computation — one task otherwise
    // minhashes the whole corpus (§2.5 input skew; single-row-group
    // scan); the exchange moves only (doc_id, text)
    val withSigs = Tables.spread(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("mhs", expr(
        s"graft_minhash(${hxAll(s"array_distinct(${shinglesOfExpr(5, "toks")})")}, $k)"))
    val bands = withSigs.select(col("doc_id") +:
      (0 until nBands).map { j =>
        val parts = (0 until bandRows)
          .map(r => s"mhs[${j * bandRows + r}]").mkString(", '_', ")
        expr(hx(s"concat($parts)")).as(s"band$j")
      }: _*)
    bands.select(col("doc_id"),
      explode(expr(s"map_from_arrays(sequence(0, ${nBands - 1}), " +
        s"array(${(0 until nBands).map(j => s"band$j").mkString(",")}))")))
      .toDF("doc_id", "band_idx", "band_key")
  }

  /** INCREMENTAL near-dup detection — dedup a NEW batch of documents
    * against the existing corpus without re-self-joining the corpus:
    * the append-only shape a daily 100 TB ingest actually runs (the
    * dedup-side sibling of imp_entity_incremental's merge-not-
    * recompute). The delta here is a deterministic slice
    * (doc_id % 10 = 7, ~10%); in production it is the day's arrivals.
    *
    * Plan shape (the whole point): the delta's banded signatures ride
    * a BROADCAST into a hash join against the corpus side, which is
    * scanned ONCE and never self-joins — corpus-side cost is linear
    * per ingest, not quadratic, and identical pairs to the full
    * self-join restricted to (new, old) — the SAME oracle CTEs prove
    * it. Delta-internal duplicates are the normal in-batch dedup's
    * job ([[dedupMinhash]] over the delta alone).
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (pairs, exploded) = dedupIncrementalUnsealed(spark, dir)
    graft.Scratch.seal(pairs, exploded).orderBy("new_id", "old_id")
  }

  /** Unsealed variant — keeps the join plan inspectable (sealing
    * checkpoints it away); returns (pairs, scratch frame to release).
    * The delta's banded-signature frame is forced-broadcast only under
    * [[MaxDeltaBroadcastDocs]] (counted on the raw documents table,
    * before any signature work); past the ceiling the hint drops and
    * AQE plans the join from runtime sizes — row-identical, spec'd.
    */
  private[graft] def dedupIncrementalUnsealed(
      spark: SparkSession, dir: String,
      maxBroadcastDocs: Long = MaxDeltaBroadcastDocs): (DataFrame, DataFrame) = {
    val deltaFits = fitsBound(Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 7).select("doc_id"), maxBroadcastDocs)
    val exploded = graft.Scratch.cp(bandedFrame(spark, dir, MinhashK, 2))
    val delta = exploded.filter(col("doc_id") % 10 === 7)
    val base = exploded.filter(col("doc_id") % 10 =!= 7)
    val deltaSide = if (deltaFits) broadcast(delta.as("n")) else delta.as("n")
    val pairs = base.as("o").join(deltaSide,
        col("o.band_idx") === col("n.band_idx") &&
          col("o.band_key") === col("n.band_key"))
      .groupBy(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
      .agg(count(lit(1)).cast(LongType).as("n_bands"))
    (pairs, exploded)
  }

  def dedupIncrementalSql: String =
    s"""WITH ${minhashCandidatesSqlCtes}
       |SELECT CASE WHEN a_id % 10 = 7 THEN a_id ELSE b_id END AS new_id,
       |       CASE WHEN a_id % 10 = 7 THEN b_id ELSE a_id END AS old_id,
       |       n_bands
       |FROM cand
       |WHERE (a_id % 10 = 7) <> (b_id % 10 = 7)
       |ORDER BY new_id, old_id""".stripMargin

  /** CTE chain ending in `cand(a_id, b_id, n_bands)` — shared by the
    * minhash oracle and the component-closure oracle.
    */
  def minhashCandidatesSqlCtes: String = {
    import GraftFunctions.{MinhashA, MinhashB, MinhashP}
    val mhs = (0 until MinhashK).map(i =>
      s"list_min([(${MinhashA(i)} * h + ${MinhashB(i)}) % $MinhashP for h in hs]) AS mh$i")
      .mkString(",\n    ")
    val bandSelects = (0 until MinhashK / 2).map(j =>
      s"SELECT doc_id, $j AS band_idx, ${hxDuck(s"CONCAT(mh${2 * j}, '_', mh${2 * j + 1})")} AS band_key FROM sigs")
      .mkString("\n  UNION ALL ")
    s"""d AS (
       |  SELECT doc_id, [${hxDuck("s")} % $MinhashP for s in list_distinct(${shinglesDuck(5)})] AS hs
       |  FROM documents),
       |sigs AS (
       |  SELECT doc_id,
       |    $mhs
       |  FROM d),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_bands
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  def dedupMinhashSql: String =
    s"""WITH ${minhashCandidatesSqlCtes}
       |SELECT a_id, b_id, n_bands FROM cand ORDER BY a_id, b_id""".stripMargin

  /** SimHash near-dup: 32-bit frequency-weighted signature computed
    * row-locally (native graft_simhash32 codegen), banded 4×8 bits.
    * Pigeonhole: a pair at Hamming distance <= 3 differs in at most 3
    * of the 4 bands, so AT LEAST ONE band matches exactly — full
    * recall for the d<=3 filter. (Two 16-bit halves would only
    * guarantee d<=1: two flipped bits can straddle both halves.)
    */
  private val SimBits = 32
  private val SimBands = 4 // 8 bits each — exact-recall band count for d<=3

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    dedupSimhashWith(spark, dir, SimBits, SimBands)

  /** dedup_simhash_prod — the PRODUCTION geometry (60 bits, 6×10
    * bands, d≤5) as its OWN gate entry with a full DuckDB oracle
    * (r13 verdict item 2; precedent: ann_ivf_hier). The 32-bit gate
    * geometry above is by-design n²/2⁹ in candidate density — it
    * stays oracle-pinned for continuity, but the headline bench row a
    * scale audit reads should time the plan a big corpus would run:
    * 6 bands of 10 bits (density n²/2¹⁶·6, measured 73 s vs 1342 s at
    * sf10), pigeonhole-exact for d ≤ 5 since bands = d+1.
    */
  def dedupSimhashProd(spark: SparkSession, dir: String): DataFrame =
    dedupSimhashWith(spark, dir, 60, 6, 5)

  /** dedup_simhash with explicit signature width × band count — the
    * SCALE knob. The gate geometry (32 bits, 4×8 bands — what the
    * oracle pins) has per-band candidate density ~n²/2⁹: measured
    * alpha = 2.26 across sf1→sf10 (PLANS.md round-12 exponent table).
    * PRODUCTION = (60, 6, d≤5) — the geometry ScaleKnobs/README/SURVEY
    * name: d/bits stays at the gate's operating point (recall within
    * 2 points of the gate at 19× fewer candidates, KNOBS_sf10), and
    * bands = d+1 keeps the exact pigeonhole guarantee. The (60, 4,
    * d≤3) point is the SUBSET-PIN TEST geometry only (same band count
    * as the gate so the prefix-subset spec applies; its fixed d on a
    * wider signature is a strictly tighter detector — recall measured
    * 0.72-0.78 in the knob table). Width is capped by hash60 (the
    * portable token hash); band count stays the d+1 floor — growing
    * bands narrows them and breaks the guarantee.
    */
  def dedupSimhashWith(spark: SparkSession, dir: String,
      bits: Int, bands: Int, maxHamming: Int = 3): DataFrame =
    // the PRODUCTION geometry opts out of the input fan-out: paired
    // sf1 A/B measured it worse there (4.13 -> 5.62; the 60-bit/6-band
    // arm's sparser buckets lose more to the 32-partition checkpoint's
    // downstream join geometry than the parallel hash gains), while
    // the 32-bit gate arm improved (7.83 -> 5.57)
    dedupSimhashOf(Tables.documents(spark, dir), bits, bands, maxHamming,
      spreadInput = bits == 32)

  /** Parametric simhash dedup over a caller-supplied (doc_id, text)
    * frame — the corpus-independent entry the geometry specs drive
    * with planted duplicates. `maxHamming` scales with the signature
    * width (d≤3 of 32 bits ≈ d≤5-6 of 60 — a fixed d on a wider
    * signature is a strictly tighter detector, measured in the
    * ScaleKnobs simhash table); the pigeonhole recall guarantee
    * requires bands ≥ maxHamming + 1.
    */
  private[graft] def dedupSimhashOf(docs: DataFrame,
      bits: Int, bands: Int, maxHamming: Int = 3,
      spreadInput: Boolean = true): DataFrame = {
    require(bits % bands == 0,
      s"dedup_simhash: bits=$bits must split evenly into bands=$bands")
    require(bands >= maxHamming + 1,
      s"dedup_simhash: bands=$bands < maxHamming+1=${maxHamming + 1} voids the pigeonhole recall guarantee")
    val w = bits / bands
    val mask = (1L << w) - 1
    GraftFunctions.register(docs.sparkSession)
    // the gate signature keeps the oracle's spelled-out function name;
    // parametric widths go through graft_simhash(arr, bits) — same
    // votes, low-32 prefix pinned by spec
    val sigExpr =
      if (bits == 32) s"graft_simhash32(${hxAll("split(text,' ')")})"
      else s"graft_simhash(${hxAll("split(text,' ')")}, $bits)"
    // signatures materialize once — they feed all band-join inputs;
    // without the barrier each side re-hashes the corpus
    val sigs = graft.Scratch.cp(
      // fan out before the signature hash (§2.5 — see cappedShinglesOf);
      // the prod geometry opts out (see dedupSimhashWith)
      (if (spreadInput) Tables.spread(docs.select(col("doc_id"), col("text")), "doc_id")
       else docs)
        .select(col("doc_id"), expr(sigExpr).as("sig")))
    // each pair emits from its FIRST matching band only (the ann_lsh
    // canonical-band argument, row-local over the two sigs), so the
    // bands-way union is disjoint BY CONSTRUCTION and the distinct
    // that re-shuffled the whole pair set (~n²/2^w × bands rows) is
    // gone; the d<=3 filter keeps full recall unchanged — pigeonhole
    // still guarantees at least one matching band, and WHICH band
    // emits a pair doesn't change the pair
    def bandJoin(b: Int) = {
      val shift = b * w
      val canonical =
        if (b == 0) "true"
        else (0 until b).map { i =>
          s"(shiftright(a.sig, ${i * w}) & $mask) <> (shiftright(b.sig, ${i * w}) & $mask)"
        }.mkString(" AND ")
      sigs.as("a").join(sigs.as("b"),
        expr(s"(shiftright(a.sig, $shift) & $mask) = (shiftright(b.sig, $shift) & $mask)") &&
          expr(canonical) &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          expr("bit_count(a.sig ^ b.sig)").cast(LongType).as("hamming"))
    }
    val pairs = (0 until bands).map(bandJoin).reduce(_ union _)
      .filter(col("hamming") <= maxHamming)
    graft.Scratch.seal(pairs, sigs).orderBy("a_id", "b_id")
  }

  /** The beyond-two-orders simhash arm: Manku-style block-combination
    * keys (the "band-prefix sharding" PLANS.md queued after r12).
    *
    * Banded simhash stays n²/2^(bits/bands) asymptotically — at the
    * production (60,6,d≤5) geometry each band key is only 10 bits, so
    * RANDOM collisions grow quadratically and the candidate-verify
    * stage re-dominates once n passes the low millions of docs
    * (measured model in PLANS.md). This variant splits the signature
    * into `blocks` blocks and keys each doc by every
    * C(blocks, keyBlocks) concatenation of `keyBlocks` block values —
    * e.g. (60 bits, 10×6-bit blocks, t=4) gives 210 keys of 24 bits:
    * 2^14 lower random-collision density per key at 35× more keys,
    * net ~467× fewer random candidates under the uniform model.
    *
    * Recall is EXACT like the banded arm, by the same pigeonhole
    * argument one level up: a pair at Hamming distance ≤ d differs in
    * ≤ d blocks, so ≥ blocks−d blocks agree; any keyBlocks-subset of
    * those (exists iff keyBlocks ≤ blocks−d, required below) collides
    * the pair. Output is therefore the IDENTICAL pair set — all pairs
    * at distance ≤ d — which the parity spec pins against
    * [[dedupSimhashWith]] row-for-row.
    *
    * Plan shape: ONE self-join on (key_idx, key_value) over an
    * exploded n×C(blocks,keyBlocks) key table (the banded arm's
    * per-band join chain with first-matching-band canonicalization
    * would need C(m,t) joins with quadratic-length predicates here).
    * A pair COULD emit once per shared subset, so each join row is
    * kept only when its key index equals graft_first_simhash_key of
    * the two signatures — the banded arm's first-matching-band
    * canonicalization one level up, row-local, making emissions
    * unique by construction with no distinct anywhere. Before any of
    * that, exact duplicates collapse to one representative per
    * DISTINCT signature (see below), and the intra-group pairs are
    * re-expanded on output.
    */
  private[graft] def dedupSimhashSharded(spark: SparkSession, dir: String,
      bits: Int = 60, blocks: Int = 10, keyBlocks: Int = 4,
      maxHamming: Int = 5): DataFrame =
    dedupSimhashShardedOf(Tables.documents(spark, dir),
      bits, blocks, keyBlocks, maxHamming)

  private[graft] def dedupSimhashShardedOf(docs: DataFrame,
      bits: Int, blocks: Int, keyBlocks: Int, maxHamming: Int): DataFrame = {
    require(bits % blocks == 0,
      s"dedup_simhash_sharded: bits=$bits must split evenly into blocks=$blocks")
    require(keyBlocks >= 1 && keyBlocks <= blocks - maxHamming,
      s"dedup_simhash_sharded: keyBlocks=$keyBlocks must be in [1, blocks-maxHamming=" +
        s"${blocks - maxHamming}] or the pigeonhole recall guarantee is void")
    val w = bits / blocks
    GraftFunctions.register(docs.sparkSession)
    val sigExpr =
      if (bits == 32) s"graft_simhash32(${hxAll("split(text,' ')")})"
      else s"graft_simhash(${hxAll("split(text,' ')")}, $bits)"
    // EXACT-DUP PRE-COLLAPSE: the LSH join runs over DISTINCT
    // signatures, one representative each — the standard production
    // dedup shape. Identical docs share every one of the
    // C(blocks,keyBlocks) keys, so joining raw docs makes every
    // dup-cluster pay g²·C(m,t) within-cluster probe evaluations per
    // shared key (the first sf10 attempt ground >10 min exactly
    // there; the banded arm pays the same g² but only ×bands). After
    // the collapse the within-cluster term vanishes from the join
    // entirely and reappears only as OUTPUT (the intra-group
    // hamming-0 expansion below) — which is the pair list itself,
    // not wasted probing.
    val sigs = graft.Scratch.cp(docs
      // NO spread: the sharded arm measured worse with it (paired
      // 4.13 -> 5.62 — the 32-partition cp perturbs the key-join
      // geometry at gate scale; the gate-geometry arm keeps its spread)
      .select(col("doc_id"), expr(sigExpr).as("sig")))
    // keys via the native graft_simhash_keys pass (the spelled-out
    // array literal at (10,4) is 210 structs × 4 shift-or terms —
    // past the 64 KB codegen method limit; the native expression
    // keeps the key-explode stage inside whole-stage codegen)
    val keyed = graft.Scratch.cp(sigs
      .groupBy("sig").agg(min("doc_id").as("rep_id"))
      .select(col("sig"), col("rep_id"),
        posexplode(expr(s"graft_simhash_keys(sig, $blocks, $keyBlocks, $w)"))
          .as(Seq("ki", "kv"))))
    // distinct-signature candidate pairs, each emitted from its FIRST
    // shared key only (the banded arm's first-matching-band
    // canonicalization one level up, row-local over the two sigs) —
    // emissions are unique by construction, no distinct anywhere.
    // The merge hint is a SCALE guard (r14, caught by the crossover
    // probe): `keyed` is a posexplode — C(blocks,keyBlocks)=210 rows
    // per signature — and Generate's size estimate ignores the
    // multiplier, an underestimate the checkpointed LogicalRDD then
    // inherits; on a diverse corpus (≈n distinct sigs — the exact
    // regime this arm exists for) static planning flipped this join
    // to a BroadcastHashJoin over the 210×-bigger-than-estimated
    // frame and died building a multi-GB broadcast at n=300k. The
    // key join must ALWAYS be shuffle-family; spec-pinned.
    val repPairs = keyed.as("a").hint("merge").join(keyed.as("b"),
        col("a.ki") === col("b.ki") && col("a.kv") === col("b.kv") &&
          col("a.sig") < col("b.sig") &&
          col("a.ki") === expr(
            s"graft_first_simhash_key(a.sig, b.sig, $blocks, $keyBlocks, $w)"))
      .select(col("a.sig").as("sa"), col("b.sig").as("sb"),
        expr("bit_count(a.sig ^ b.sig)").cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    // expansion back to doc pairs — output-sized work by definition:
    // intra-group pairs are hamming 0 (identical sigs), inter-group
    // pairs inherit their reps' hamming; least/greatest restores the
    // a_id < b_id orientation (member ids of different groups
    // interleave freely)
    val intra = sigs.as("a").join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        lit(0L).as("hamming"))
    val inter = repPairs
      .join(sigs.select(col("sig").as("sa"), col("doc_id").as("xa")), "sa")
      .join(sigs.select(col("sig").as("sb"), col("doc_id").as("xb")), "sb")
      .select(least(col("xa"), col("xb")).as("a_id"),
        greatest(col("xa"), col("xb")).as("b_id"), col("hamming"))
    graft.Scratch.seal(intra.union(inter), sigs, keyed).orderBy("a_id", "b_id")
  }

  /** Parametric oracle rendering shared by the gate geometry and the
    * production geometry entry — the signature recipe is width-generic
    * (bit j votes from bit j of the 60-bit token hash, exactly
    * [[graft.functions.SimHashBits]]), so only the series bound, band
    * masks, and hamming cut change.
    */
  private[graft] def dedupSimhashSqlWith(bits: Int, bands: Int, maxHamming: Int): String = {
    val w = bits / bands
    val mask = (1L << w) - 1
    val bandJoins = (0 until bands).map { b =>
      val shift = b * w
      s"""SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sig AS sa, b.sig AS sb
         |  FROM sigs a JOIN sigs b
         |    ON (a.sig >> $shift) & $mask = (b.sig >> $shift) & $mask
         |   AND a.doc_id < b.doc_id""".stripMargin
    }.mkString("\n  UNION\n  ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
       |votes AS (
       |  SELECT doc_id, j,
       |    SUM(CASE WHEN (${hxDuck("w")} >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM tok, (SELECT unnest(generate_series(0, ${bits - 1})) AS j) bits
       |  GROUP BY doc_id, j),
       |sigs AS (
       |  SELECT doc_id,
       |    SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS sig
       |  FROM votes GROUP BY doc_id),
       |cand AS (
       |  $bandJoins)
       |SELECT DISTINCT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= $maxHamming
       |ORDER BY a_id, b_id""".stripMargin
  }

  def dedupSimhashSql: String = dedupSimhashSqlWith(SimBits, SimBands, 3)

  def dedupSimhashProdSql: String = dedupSimhashSqlWith(60, 6, 5)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_ttr" -> (textTtr _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_normalize" -> (textNormalize _),
    "text_pii" -> (textPii _),
    "text_repetition" -> (textRepetition _),
    "text_oov" -> (textOov _),
    "text_bigram" -> (textBigram _),
    "text_tfidf" -> (textTfidf _),
    "text_vocab" -> (textVocab _),
    "text_winnow" -> (textWinnow _),
    "dedup_exact" -> (dedupExact _),
    "dedup_winnow" -> (dedupWinnow _),
    "dedup_winnow_inc" -> (dedupWinnowInc _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_substring_inc" -> (dedupSubstringInc _),
    "dedup_ngram" -> (dedupNgram _),
    "dedup_ngram_prod" -> (dedupNgramProd _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_simhash_prod" -> (dedupSimhashProd _))

  def oracles: Map[String, String] = Map(
    "text_tokens" -> textTokensSql,
    "text_quality" -> textQualitySql,
    "text_ttr" -> textTtrSql,
    "text_langid" -> textLangidSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_normalize" -> textNormalizeSql,
    "text_pii" -> textPiiSql,
    "text_repetition" -> textRepetitionSql,
    "text_oov" -> textOovSql,
    "text_bigram" -> textBigramSql,
    "text_tfidf" -> textTfidfSql,
    "text_vocab" -> textVocabSql,
    "text_winnow" -> textWinnowSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_winnow" -> dedupWinnowSql,
    "dedup_winnow_inc" -> dedupWinnowIncSql,
    "dedup_substring" -> dedupSubstringSql,
    "dedup_substring_inc" -> dedupSubstringIncSql,
    "dedup_ngram" -> dedupNgramSql,
    "dedup_ngram_prod" -> dedupNgramProdSql,
    "dedup_minhash" -> dedupMinhashSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_simhash_prod" -> dedupSimhashProdSql)
}
