package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Scoped lifecycle management for `localCheckpoint` materializations.
  *
  * Operators materialize derived frames (signatures, bucketed vectors,
  * capped shingle sets) once so self-joins don't recompute the
  * derivation per side. `localCheckpoint` truncates lineage by pinning
  * the partitions in block-manager storage — storage that nothing
  * releases when the consuming query finishes. In a long-lived session
  * those blocks accumulate and every later query pays the eviction
  * pressure (measured in round 1: a 15× tail inflation across a
  * 50-query sweep).
  *
  * Discipline:
  *   - [[cp]] every intermediate materialization (tracked);
  *   - [[seal]] the operator's result: materialize it (it is small —
  *     candidate pairs, top-k, per-doc signatures), then free the
  *     intermediates immediately, so the blocks an operator leaves
  *     behind are bounded by its RESULT size, not its working set;
  *   - [[releaseAll]] between queries (Bench/Verify do) or whenever a
  *     session wants its scratch space back — sealed results are
  *     tracked too.
  *
  * Freeing is safe only for frames that are never read again: a
  * localCheckpoint's lineage is gone, so unpersist deletes the data,
  * not a cache of it.
  */
object Scratch {

  private val live = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[RDD[_], java.lang.Boolean]())

  /** The checkpointed RDDs a materialized frame reads from. */
  private def leafRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collectLeaves().toSeq.collect {
      case lr: LogicalRDD => lr.rdd
    }

  /** Eager localCheckpoint, tracked for release. */
  def cp(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(eager = true)
    leafRdds(out).foreach(live.add)
    out
  }

  /** Release tracked checkpoints' storage. The frames must not be read
    * again (lineage is truncated — the blocks ARE the data).
    */
  def free(dfs: DataFrame*): Unit = dfs.foreach { df =>
    leafRdds(df).foreach { r =>
      r.unpersist(blocking = false)
      live.remove(r)
    }
  }

  /** Materialize an operator's (small) final frame, then free the
    * intermediate materializations it consumed.
    */
  def seal(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = cp(result)
    free(intermediates: _*)
    out
  }

  /** Session-level sweep: release every tracked checkpoint. Call when
    * all frames previously returned by graft operators are fully
    * consumed (e.g. between bench queries).
    */
  def releaseAll(): Unit = {
    val it = live.iterator()
    while (it.hasNext) {
      it.next().unpersist(blocking = false)
      it.remove()
    }
  }

  /** Number of tracked live checkpoints (spec hook). */
  def liveCount: Int = live.size()
}
