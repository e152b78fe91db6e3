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
  * Algorithm: min-label propagation WITH pointer doubling — every
  * node starts labeled with itself; each round it takes the min over
  * (its label, its neighbors' labels, its label's OWN label). The
  * last term is the shortcut: label chains halve every round, so
  * convergence is O(log diameter) rounds instead of O(diameter) —
  * a 200-node path (diameter 199) converges well inside the 50-round
  * cap (spec-pinned) where plain propagation would need 199. Each
  * round is two joins + one aggregation, all on the node key, the
  * shortcut join being a self-join of the (already materialized)
  * label frame; lineage is truncated per round (localCheckpoint) so
  * plans stay flat. This is the standard large-scale CC family
  * (GraphX's Pregel CC plus the Hash-to-Min shortcut); no driver-side
  * graph materializes.
  */
object Components {

  /** Label-propagate to convergence over an undirected edge list
    * (columns `a_id`, `b_id`) covering `nodes` (column `doc_id`).
    * Returns (doc_id, component) where component = min doc_id reachable.
    * Superseded label generations and the symmetrized edge list are
    * released as soon as they can no longer be read (graft.Scratch);
    * only the final labels stay materialized for the caller.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // materialize the edge list ONCE — the loop re-reads it every
    // round, and without the barrier each round would recompute the
    // full candidate-generation plan (minhash signatures included)
    val sym = graft.Scratch.cp(
      edges.select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(edges.select(col("b_id").as("src"), col("a_id").as("dst"))))
    val MaxRounds = 50
    var labels = graft.Scratch.cp(
      nodes.select(col("doc_id"), col("doc_id").as("component")))
    // labels only ever decrease; the label sum is a strictly
    // decreasing convergence witness (one agg per round, carried
    // over). Summed in decimal(38,0) — a bigint sum would wrap at
    // billion-node/large-id scale and wrapped equality is not a
    // convergence proof. Sum over zero rows is null — an empty node
    // set is already converged.
    def witnessOf(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head()
        .getDecimal(0)
    val first = witnessOf(labels)
    if (first == null) { graft.Scratch.free(sym); return labels }
    var witness = first
    var converged = false
    var rounds = 0
    while (!converged && rounds < MaxRounds) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("doc_id"))
        .groupBy(col("src").as("doc_id"))
        .agg(min("component").as("nbr_min"))
      // pointer shortcut: my label is always some node's id, so look
      // up THAT node's label — chains halve per round (O(log d))
      val ptrMin = labels.as("l1")
        .join(labels.as("l2"), col("l1.component") === col("l2.doc_id"))
        .select(col("l1.doc_id").as("doc_id"), col("l2.component").as("ptr_min"))
      val next = graft.Scratch.cp(labels.as("l")
        .join(neighborMin.as("n"), Seq("doc_id"), "left")
        .join(ptrMin.as("p"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("component"),
            coalesce(col("nbr_min"), col("component")),
            coalesce(col("ptr_min"), col("component"))).as("component")))
      val after = witnessOf(next)
      converged = witness.compareTo(after) == 0
      witness = after
      graft.Scratch.free(labels)
      labels = next
      rounds += 1
    }
    graft.Scratch.free(sym)
    // with shortcutting, MaxRounds=50 covers diameters up to ~2^50 —
    // hitting it means the loop is broken, not the graph too long;
    // silent under-merge is worse than failing loudly
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $MaxRounds rounds — graph diameter too large")
    labels
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
    import org.apache.spark.sql.types.LongType
    val docs = Tables.documents(spark, dir).select("doc_id")
    val pairs = TextOps.minhashCandidates(spark, dir)
    val labels = connectedComponents(docs, pairs)
    graft.Scratch.free(pairs)
    val quality = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast(LongType))
      .withColumn("n_stop",
        size(expr("filter(split(text,' '), t -> t = 'the' OR t = 'a')")).cast(LongType))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens").between(30, 400) &&
            expr("10000 * n_stop DIV n_tokens").between(100, 3000), 1L)
          .otherwise(0L).as("q_rank"))
    selectReps(labels.join(quality, "doc_id")).orderBy("doc_id")
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
    "dedup_cluster_rep" -> (dedupClusterRep _),
    "pipe_keeplist" -> (pipeKeeplist _))

  def oracles: Map[String, String] = Map(
    "dedup_components" -> dedupComponentsSql,
    "dedup_cluster_rep" -> dedupClusterRepSql,
    "pipe_keeplist" -> pipeKeeplistSql)
}
