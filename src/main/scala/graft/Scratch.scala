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
  *
  * CONCURRENCY CONTRACT: [[releaseAll]] sweeps the WHOLE JVM's tracked
  * checkpoints, so it belongs to single-threaded drivers (one graft
  * operator in flight at a time — Bench, Verify, a sequential
  * notebook). A consumer running graft operators CONCURRENTLY in one
  * session must not call it (it would free another query's live
  * blocks mid-read and fail that query's collect with missing-block
  * recomputation errors); each thread wraps its operator in
  * [[scoped]] instead, which frees exactly the checkpoints created in
  * that dynamic extent — consume the result before the scope closes.
  */
object Scratch {

  private val live = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[RDD[_], java.lang.Boolean]())

  /** Innermost [[scoped]] sets per thread (checkpoint creation is
    * driver-side, so the creating thread is the scoping thread).
    */
  private val scopes = new ThreadLocal[List[java.util.Set[RDD[_]]]] {
    override def initialValue(): List[java.util.Set[RDD[_]]] = Nil
  }

  /** Run `body` in a checkpoint scope: every [[cp]]/[[seal]] on this
    * thread inside it is freed when the scope closes — the
    * concurrency-safe alternative to [[releaseAll]] (see class doc).
    * The scope's result must be fully consumed (collected/written)
    * before this returns it.
    */
  def scoped[T](body: => T): T = {
    val s = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[RDD[_], java.lang.Boolean]())
    scopes.set(s :: scopes.get)
    try body
    finally {
      scopes.set(scopes.get.tail)
      s.forEach { r => r.unpersist(blocking = false); live.remove(r) }
    }
  }

  /** The checkpointed RDDs a materialized frame reads from. */
  private def leafRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collectLeaves().toSeq.collect {
      case lr: LogicalRDD => lr.rdd
    }

  /** Eager localCheckpoint, tracked for release (and by the innermost
    * [[scoped]] block on this thread, if any).
    */
  def cp(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(eager = true)
    val leaves = leafRdds(out)
    leaves.foreach(live.add)
    scopes.get.headOption.foreach(s => leaves.foreach(s.add))
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

  /** Session-level sweep: release every tracked checkpoint JVM-WIDE.
    * Call only from a single-threaded driver, when all frames
    * previously returned by graft operators are fully consumed (e.g.
    * between bench queries) — see the class concurrency contract;
    * concurrent consumers use [[scoped]] instead.
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
