package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster closure: connected components over the near-dup
  * candidate graph, the primitive that turns pairwise near-dup hits
  * into keep-lists at corpus scale (pairs alone under-delete: a~b and
  * b~c must collapse to ONE kept doc, which needs the transitive
  * closure, not the pair list).
  *
  * Algorithm: alternating large-star / small-star edge contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014 — the public two-phase algorithm GraphFrames ships).
  * Each round rewrites the EDGE SET toward a star forest: large-star
  * hooks every node's larger neighbors onto its neighborhood minimum,
  * small-star re-points every node and its smaller neighbors at that
  * minimum. The only fixed points are star forests whose roots are
  * the component minima, and alternation reaches one in O(log² n)
  * rounds (2-3 in practice on dedup graphs, whose clusters are
  * near-cliques from banded LSH).
  *
  * Why contraction and not label propagation at 100 TB: propagation
  * shuffles an N-row label table (plus the full edge list) EVERY
  * round regardless of progress; contraction's working set is the
  * edge list itself, which SHRINKS toward one star edge per non-root
  * node as soon as hooks land — later rounds touch cluster
  * membership, not the corpus. Each round is two groupBy-min + join
  * passes over the current edges; lineage is truncated per round
  * (graft.Scratch) so plans stay flat. No driver-side graph
  * materializes.
  */
object Components {

  /** Rounds taken by the most recent [[connectedComponents]] run on
    * this JVM (diagnostic hook for specs and the PLANS.md scale
    * record; -1 until a run completes).
    */
  private[graft] val lastRounds = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** True iff the canonical (u > v, child → root) edge set is a star
    * forest: every child carries exactly ONE root edge and no node is
    * both a child and a root (a node with two distinct roots, or a
    * chain u → v → w, still has contraction work left — both shapes
    * were verified non-fixed by hand-running the round on them). One
    * single-scan aggregation: each edge contributes its endpoints'
    * child/root roles via a 2-element explode (NOT a self-union,
    * which would scan — and on an unmaterialized checkpoint,
    * compute — the frame twice), then any node violating the star
    * shape flags non-convergence.
    */
  private def isStarForest(edges: DataFrame): Boolean =
    edges.select(explode(array(
        struct(col("u").as("n"), lit(1L).as("c"), lit(0L).as("p")),
        struct(col("v").as("n"), lit(0L).as("c"), lit(1L).as("p")))).as("e"))
      .groupBy(col("e.n"))
      .agg(sum(col("e.c")).as("c"), sum(col("e.p")).as("p"))
      .filter(col("c") > 1 || (col("c") === 1 && col("p") > 0))
      .isEmpty

  /** Contract to a star forest over an undirected edge list (columns
    * `a_id`, `b_id`) covering `nodes` (column `doc_id`). Returns
    * (doc_id, component) where component = min doc_id reachable.
    * Superseded edge generations are released as soon as they can no
    * longer be read (graft.Scratch); only the final labels stay
    * materialized for the caller.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // canonical large→small orientation, deduped, self-loops dropped —
    // materialized ONCE so the loop never recomputes the candidate
    // generation (minhash signatures included) feeding the edge list
    var cur = graft.Scratch.cp(
      edges.select(
        greatest(col("a_id"), col("b_id")).as("u"),
        least(col("a_id"), col("b_id")).as("v"))
        .filter(col("u") =!= col("v")).distinct())
    val MaxRounds = 50
    var converged = false
    var rounds = 0
    while (!converged && rounds < MaxRounds) {
      // LARGE-STAR over the symmetric neighborhood: for each node u
      // with m = min(Γ(u) ∪ {u}), hook every LARGER neighbor v
      // directly onto m. Emitted edges keep the canonical orientation
      // by construction (v > u ≥ m).
      val sym = cur.select(col("u"), col("v"))
        .union(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // SMALL-STAR on the (already large→small) result: for each node
      // u with m = min of its smaller neighbors, re-point u AND every
      // other smaller neighbor at m. Again canonical by construction.
      val mins2 = ls.groupBy("u").agg(min(col("v")).as("m"))
      val next = graft.Scratch.cpLazy(
        ls.join(mins2, "u")
          .select(col("v").as("n"), col("m"))
          .filter(col("n") =!= col("m"))
          .select(col("n").as("u"), col("m").as("v"))
          .union(mins2.select(col("u"), col("m").as("v")))
          .distinct())
      // Converged ⟺ the contracted edge set IS a star forest (Kiveris:
      // star forests are exactly the contraction's fixed points), so
      // convergence is detectable on the round that PRODUCES the
      // forest — one full contraction round earlier than waiting to
      // observe next == cur, which had to run (and pay) the identity
      // round. The probe is a single-scan aggregation over `next`
      // that doubles as the lazy checkpoint's materializing action:
      // one job per round where the old loop paid materialize +
      // count + (final round) exceptAll.
      converged = isStarForest(next)
      graft.Scratch.free(cur)
      cur = next
      rounds += 1
    }
    lastRounds.set(rounds)
    // 50 rounds covers the O(log² n) bound at any conceivable corpus —
    // hitting the cap means the loop is broken, not the graph too
    // large; silent under-merge is worse than failing loudly
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $MaxRounds rounds")
    // star forest: every non-root carries exactly one edge (u → its
    // component root). The groupBy-min is the identity there and
    // pins the 1:1 shape even if a future edit perturbs the loop.
    val roots = cur.groupBy(col("u").as("doc_id")).agg(min("v").as("component"))
    val labels = nodes
      .join(roots, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    graft.Scratch.seal(labels, cur)
  }

  /** Minhash-LSH candidate pairs → duplicate clusters: one row per
    * document with its component label and whether it is the kept
    * representative (min id of the cluster).
    */
  def dedupComponents(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val pairs = TextOps.minhashCandidates(spark, dir)
    val labels = connectedComponents(docs, pairs)
    // the closure consumed the pair list eagerly (labels are
    // materialized) — release it before returning
    graft.Scratch.free(pairs)
    labels
      .select(col("doc_id"), col("component"),
        (col("doc_id") === col("component")).as("keep"))
      .orderBy("doc_id")
  }

  /** Oracle: transitive closure via recursive CTE (UNION dedups, so
    * the recursion terminates on cycles), component = min reachable.
    */
  def dedupComponentsSql: String =
    s"""WITH RECURSIVE ${TextOps.minhashCandidatesSqlCtes},
       |sym AS (
       |  SELECT a_id AS src, b_id AS dst FROM cand
       |  UNION
       |  SELECT b_id, a_id FROM cand),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
       |SELECT src AS doc_id, MIN(dst) AS component,
       |  src = MIN(dst) AS keep
       |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin

  /** Merge a delta's pair edges into an EXISTING labeling without
    * re-contracting history (r17 verdict item 5 — the closure's
    * incremental arm, closing the last merge-not-recompute gap: every
    * detector family already has one, but the closure step re-ran
    * from scratch on the full pair graph every ingest). The standing
    * labeling enters as its star forest — one (doc_id → component)
    * edge per non-root, ZERO edges for singletons (the overwhelming
    * majority of a deduped corpus) — unioned with the delta's pairs
    * and contracted to fixpoint. Star forests are the contraction's
    * fixed points, so untouched components are inert from round one
    * (spec-pinned label stability) and the rounds are bounded by the
    * delta-affected subgraph's diameter, not the corpus's history.
    * Labels stay min-reachable over the merged graph, so a delta doc
    * with a smaller id than an old root re-labels exactly as a full
    * recompute would.
    */
  def mergeComponents(nodes: DataFrame, labels: DataFrame,
      deltaEdges: DataFrame): DataFrame = {
    val starEdges = labels.filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("a_id"), col("component").as("b_id"))
    connectedComponents(nodes,
      starEdges.unionByName(deltaEdges.select("a_id", "b_id")))
  }

  /** Gate entry: incremental closure for the daily-append shape.
    * Corpus = doc_id % 10 ≠ 7 (every incremental gate's split), delta
    * = the % 10 = 7 arrivals. The self-contained gate query has to
    * BUILD "yesterday's" labeling first (production reads it
    * materialized): corpus-only candidate pairs → corpus closure.
    * The incremental arm is everything after: the delta's banded
    * signatures join ONCE against the full banded frame (linear in
    * the delta — the corpus never re-self-joins, the
    * [[TextOps.dedupIncremental]] posture), and [[mergeComponents]]
    * contracts stars ∪ delta-pairs. Corpus–corpus candidates are a
    * pure pair function of the two docs, so the delta cannot create
    * or destroy them — merge ≡ recompute exactly, and the oracle IS
    * the full recompute ([[dedupComponentsSql]] verbatim over
    * corpus ∪ delta = all documents), so the hash gate proves it.
    */
  def dedupComponentsInc(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val nodes = docs.select("doc_id")
    val nBands = (TextOps.MinhashK / 2).toLong
    val banded = graft.Scratch.cp(TextOps.bandedOf(docs, TextOps.MinhashK, 2))
    val corpusB = KnownWindow.guard(
      banded.filter(col("doc_id") % 10 =!= 7), nBands)
    val deltaB = KnownWindow.guard(
      banded.filter(col("doc_id") % 10 === 7), nBands)
    val allB = KnownWindow.guard(banded, nBands)
    // ---- yesterday's state (production: already materialized) ----
    val corpusPairs = corpusB.as("a").join(corpusB.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    val labels0 = connectedComponents(
      nodes.filter(col("doc_id") % 10 =!= 7), corpusPairs)
    // ---- the daily step: delta-involving pairs only ----
    // one hash join, delta on the build side, full frame scanned once;
    // orientation is irrelevant (connectedComponents canonicalizes) and
    // delta-internal pairs arrive via the delta rows in `allB`
    val deltaEdges = deltaB.as("n").join(allB.as("o"),
        col("n.band_idx") === col("o.band_idx") &&
          col("n.band_key") === col("o.band_key") &&
          col("n.doc_id") =!= col("o.doc_id"))
      .select(col("n.doc_id").as("a_id"), col("o.doc_id").as("b_id"))
    val merged = mergeComponents(nodes, labels0, deltaEdges)
    graft.Scratch.free(banded, labels0)
    merged
      .select(col("doc_id"), col("component"),
        (col("doc_id") === col("component")).as("keep"))
      .orderBy("doc_id")
  }

  /** Oracle: the FULL closure over corpus ∪ delta = all documents —
    * [[dedupComponentsSql]] verbatim, so the gate hash is itself the
    * merge ≡ recompute proof (the ann_*_append bar).
    */
  def dedupComponentsIncSql: String = dedupComponentsSql

  /** The pipeline's end product: the training-data keep-list. A
    * document survives iff it passes the quality gate AND is its
    * duplicate-cluster's representative — the composition every
    * corpus-prep pipeline ships, here as one declarative plan over the
    * quality and closure operators.
    */
  def pipeKeeplist(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.textQuality(spark, dir)
      .select(col("doc_id"), col("bucket"))
    val keepers = dedupComponents(spark, dir)
      .select(col("doc_id"), col("component"), col("keep"))
    keepers.join(quality, "doc_id")
      .filter(col("keep") && col("bucket") === "good")
      .select("doc_id", "component")
      .orderBy("doc_id")
  }

  def pipeKeeplistSql: String =
    s"""WITH RECURSIVE ${TextOps.minhashCandidatesSqlCtes},
       |sym AS (
       |  SELECT a_id AS src, b_id AS dst FROM cand
       |  UNION
       |  SELECT b_id, a_id FROM cand),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
       |comp AS (
       |  SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src),
       |q AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
       |    CAST(len(list_filter(string_split(text,' '), t -> t = 'the' OR t = 'a')) AS BIGINT) AS n_stop
       |  FROM documents)
       |SELECT c.doc_id, c.component
       |FROM comp c JOIN q ON q.doc_id = c.doc_id
       |WHERE c.doc_id = c.component
       |  AND q.n_tokens BETWEEN 30 AND 400
       |  AND 10000 * q.n_stop // q.n_tokens BETWEEN 100 AND 3000
       |ORDER BY c.doc_id""".stripMargin

  /** Cluster-representative selection by QUALITY, not by id: within
    * each duplicate cluster keep the member that ranks highest on
    * (quality-gate pass, token length, then min doc_id as the
    * deterministic tie-break) — the "keep the best copy" rule real
    * corpus-prep pipelines apply (the min-id rule of
    * [[dedupComponents]] deletes a clean original whenever a
    * truncated mirror happens to carry a smaller id). The ordering
    * triple is strict-total (doc_id is unique), so the pick is
    * engine-portable.
    *
    * Scale posture: the quality features are row-local; the pick is
    * ONE `max_by(doc_id, struct(...))` groupBy on the component key —
    * commutative, so map-side partials shrink it to one candidate
    * row per (partition, component) before the shuffle; the
    * decoration join back to members is AQE-decided (the rep table
    * is one row per CLUSTER, far smaller than the corpus — broadcast
    * at any skewless scale). No window over the corpus, no sort.
    */
  def dedupClusterRep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val pairs = TextOps.minhashCandidates(spark, dir)
    val labels = connectedComponents(docs, pairs)
    graft.Scratch.free(pairs)
    selectReps(labels.join(qualityRank(spark, dir), "doc_id")).orderBy("doc_id")
  }

  /** The representative-quality features (one text scan) — split out
    * so ScaleKnobs can time this stage against the component build
    * when attributing dedup_cluster_rep's scaling exponent.
    */
  private[graft] def qualityRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    // fan out before the tokenize (§2.5 input skew — single-row-group
    // corpus scan)
    Tables.spread(Tables.documents(spark, dir), "doc_id")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast(LongType))
      .withColumn("n_stop",
        size(expr("filter(split(text,' '), t -> t = 'the' OR t = 'a')")).cast(LongType))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens").between(30, 400) &&
            expr("10000 * n_stop DIV n_tokens").between(100, 3000), 1L)
          .otherwise(0L).as("q_rank"))
  }

  /** The quality-argmax pick over labeled members — split out so the
    * ordering rule is testable on constructed clusters (in particular
    * the case the min-id rule gets wrong: the lowest id is the WORST
    * copy). Input: (doc_id, component, q_rank, n_tokens).
    */
  private[graft] def selectReps(member: DataFrame): DataFrame = {
    val reps = member.groupBy("component")
      .agg(max_by(col("doc_id"),
        struct(col("q_rank"), col("n_tokens"), (-col("doc_id")).as("neg_id")))
        .as("rep_id"))
    member.join(reps, "component")
      .select(col("doc_id"), col("component"), col("q_rank"), col("n_tokens"),
        col("rep_id"), (col("doc_id") === col("rep_id")).as("keep"))
  }

  def dedupClusterRepSql: String =
    s"""WITH RECURSIVE ${TextOps.minhashCandidatesSqlCtes},
       |sym AS (
       |  SELECT a_id AS src, b_id AS dst FROM cand
       |  UNION
       |  SELECT b_id, a_id FROM cand),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
       |comp AS (
       |  SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src),
       |q AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
       |    CAST(len(list_filter(string_split(text,' '), t -> t = 'the' OR t = 'a')) AS BIGINT) AS n_stop
       |  FROM documents),
       |m AS (
       |  SELECT c.doc_id, c.component, q.n_tokens,
       |    CAST(CASE WHEN q.n_tokens BETWEEN 30 AND 400
       |               AND 10000 * q.n_stop // q.n_tokens BETWEEN 100 AND 3000
       |         THEN 1 ELSE 0 END AS BIGINT) AS q_rank
       |  FROM comp c JOIN q ON q.doc_id = c.doc_id),
       |r AS (
       |  SELECT component, doc_id AS rep_id,
       |    row_number() OVER (PARTITION BY component
       |      ORDER BY q_rank DESC, n_tokens DESC, doc_id ASC) AS rn
       |  FROM m)
       |SELECT m.doc_id, m.component, m.q_rank, m.n_tokens,
       |  r.rep_id, m.doc_id = r.rep_id AS keep
       |FROM m JOIN r ON m.component = r.component AND r.rn = 1
       |ORDER BY m.doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_components" -> (dedupComponents _),
    "dedup_components_inc" -> (dedupComponentsInc _),
    "dedup_cluster_rep" -> (dedupClusterRep _),
    "pipe_keeplist" -> (pipeKeeplist _))

  def oracles: Map[String, String] = Map(
    "dedup_components" -> dedupComponentsSql,
    "dedup_components_inc" -> dedupComponentsIncSql,
    "dedup_cluster_rep" -> dedupClusterRepSql,
    "pipe_keeplist" -> pipeKeeplistSql)
}
