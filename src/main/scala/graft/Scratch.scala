package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scoped lifecycle management for intermediate materializations, with
  * a conf-selected storage backend.
  *
  * Operators materialize derived frames (signatures, bucketed vectors,
  * capped shingle sets) once so self-joins don't recompute the
  * derivation per side. Two backends implement that materialization,
  * selected per-session by `spark.graft.scratch`:
  *
  *   - **`local`** (default) — `localCheckpoint`: truncates lineage by
  *     pinning the partitions in executor block-manager storage. The
  *     right call on local[*] and short-lived jobs: zero serialization
  *     to disk-format, blocks die with the JVM. Its fault model is the
  *     trade: the blocks ARE the data (no recompute), so on a real
  *     cluster one lost executor mid-operator fails the consuming
  *     query unrecoverably.
  *   - **`dir`** — durable scratch files: the frame is written once as
  *     parquet under `spark.graft.scratch.dir` (any Hadoop-compatible
  *     filesystem — local tmp, HDFS, object store) and read back. The
  *     100 TB / 1000-executor fault model: a lost executor re-reads
  *     its split from the scratch store like any other scan, and the
  *     scratch store is sized by the cluster, not by executor memory.
  *     Costs one write+read of the intermediate (columnar-compressed).
  *
  * Both backends enforce the SAME lifecycle — storage that nothing
  * releases when the consuming query finishes accumulates either way
  * (round 1 measured a 15× tail inflation across a 50-query sweep from
  * unreleased checkpoint blocks; an unswept scratch dir fills a disk
  * just as surely).
  *
  * Discipline:
  *   - [[cp]] every intermediate materialization (tracked);
  *   - [[seal]] the operator's result: materialize it (it is small —
  *     candidate pairs, top-k, per-doc signatures), then free the
  *     intermediates immediately, so the storage an operator leaves
  *     behind is bounded by its RESULT size, not its working set;
  *   - [[releaseAll]] between queries (Bench/Verify do) or whenever a
  *     session wants its scratch space back — sealed results are
  *     tracked too.
  *
  * Freeing is safe only for frames that are never read again: a
  * localCheckpoint's lineage is gone and a scratch file's delete is a
  * delete — in both backends the release removes the data, not a cache
  * of it.
  *
  * CONCURRENCY CONTRACT: [[releaseAll]] sweeps the WHOLE JVM's tracked
  * materializations, so it belongs to single-threaded drivers (one
  * graft operator in flight at a time — Bench, Verify, a sequential
  * notebook). A consumer running graft operators CONCURRENTLY in one
  * session must not call it (it would free another query's live
  * storage mid-read and fail that query's collect); each thread wraps
  * its operator in [[scoped]] instead, which frees exactly the
  * materializations created in that dynamic extent — consume the
  * result before the scope closes.
  */
object Scratch {

  /** One releasable unit of scratch storage behind a [[cp]] frame.
    * Equality is identity-of-storage (RDD reference / qualified path)
    * so [[free]] can map a frame's plan leaves back to tracked
    * handles.
    */
  private sealed trait Handle { def release(): Unit }

  private final case class RddHandle(rdd: RDD[_]) extends Handle {
    def release(): Unit = rdd.unpersist(blocking = false)
  }

  /** `path` is the fully-qualified URI string of one scratch dir. */
  private final case class DirHandle(path: String) extends Handle {
    def release(): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      try {
        val conf = org.apache.spark.sql.SparkSession.getActiveSession
          .map(_.sparkContext.hadoopConfiguration)
          .getOrElse(new org.apache.hadoop.conf.Configuration())
        p.getFileSystem(conf).delete(p, true)
      } catch { case _: java.io.IOException => () } // best-effort; the root dir is sweepable
    }
  }

  private val live = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[Handle, java.lang.Boolean]())

  /** Audit hook: when set, [[cp]] invokes it with (input, output) for
    * every materialization — the input frame's plan is the PRE-SEAL
    * segment an end-of-operator plan walk can never see (after seal
    * the consumer reads a LogicalRDD stub and every upstream static
    * decision, including the Generate-underestimate broadcast trap,
    * is invisible). [[graft.BroadcastAudit]] registers itself here;
    * nothing else should. The hook runs on the materializing (driver)
    * thread and must not throw — a probe that can fail wraps its own
    * body.
    */
  private[graft] val planProbe =
    new java.util.concurrent.atomic.AtomicReference[(DataFrame, DataFrame) => Unit](null)

  /** Innermost [[scoped]] sets per thread (materialization is
    * driver-side, so the creating thread is the scoping thread).
    */
  private val scopes = new ThreadLocal[List[java.util.Set[Handle]]] {
    override def initialValue(): List[java.util.Set[Handle]] = Nil
  }

  /** Run `body` in a scratch scope: every [[cp]]/[[seal]] on this
    * thread inside it is freed when the scope closes — the
    * concurrency-safe alternative to [[releaseAll]] (see class doc).
    * The scope's result must be fully consumed (collected/written)
    * before this returns it.
    */
  def scoped[T](body: => T): T = {
    val s = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Handle, java.lang.Boolean]())
    scopes.set(s :: scopes.get)
    try body
    finally {
      scopes.set(scopes.get.tail)
      s.forEach { h => h.release(); live.remove(h) }
    }
  }

  /** The scratch storage a materialized frame reads from: checkpoint
    * RDD leaves (local backend) and scratch-dir scan roots (dir
    * backend). Dir handles are matched against [[live]] before any
    * delete, so a frame that merely READS ordinary parquet can never
    * have its inputs removed by [[free]].
    */
  private def leafHandles(df: DataFrame): Seq[Handle] =
    df.queryExecution.analyzed.collectLeaves().toSeq.flatMap {
      case lr: LogicalRDD => Seq(RddHandle(lr.rdd))
      case rel: LogicalRelation => rel.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(p => DirHandle(p.toString))
        case _ => Nil
      }
      case _ => Nil
    }

  /** Eager materialization on the session's configured backend,
    * tracked for release (and by the innermost [[scoped]] block on
    * this thread, if any).
    */
  def cp(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val backend =
      try spark.conf.get("spark.graft.scratch", "local")
      catch { case _: Throwable => "local" }
    val (out, handles) = backend match {
      case "dir" =>
        val root = spark.conf.get("spark.graft.scratch.dir",
          sys.props("java.io.tmpdir").stripSuffix("/") + "/graft-scratch")
        val raw = new org.apache.hadoop.fs.Path(
          root, "cp-" + java.util.UUID.randomUUID().toString)
        val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dir = fs.makeQualified(raw)
        df.write.parquet(dir.toString)
        // explicit schema: an all-empty intermediate may leave no data
        // files, and schema inference over zero footers would throw.
        // RESTORE SPREAD ON UNDER-SPLIT SCANS: a bench-scale scratch
        // frame is small next to maxPartitionBytes, so the read-back
        // bin-packs every part file into 1-2 splits — and the
        // self-joins these frames feed do their quadratic
        // pair-evaluation at whatever parallelism the probe side has
        // (measured: ann_lsh 7.5 → 217 s at sf1 when the bucketed
        // frame came back as 2 splits and the small file stats
        // flipped the join to a 2-partition-probe broadcast join;
        // localCheckpoint's LogicalRDD reports unknown-huge size and
        // keeps the 32-way shuffle join). Re-spreading to the
        // session's shuffle parallelism costs one round-robin
        // exchange per consumer read — the durability tax at bench
        // scale. At production scale the frame's natural split count
        // exceeds the threshold and NO extra exchange is added.
        val rd0 = spark.read.schema(df.schema).parquet(dir.toString)
        val target = spark.sessionState.conf.numShufflePartitions
        val rd =
          if (rd0.rdd.getNumPartitions * 2 < target) rd0.repartition(target)
          else rd0
        // track by the READ-BACK frame's own root paths so free()'s
        // leaf extraction matches byte-for-byte (qualification included)
        (rd, leafHandles(rd).collect { case d: DirHandle => d })
      case "local" =>
        val out = df.localCheckpoint(eager = true)
        (out, leafHandles(out).collect { case r: RddHandle => r })
      case other => throw new IllegalArgumentException(
        s"spark.graft.scratch must be 'local' or 'dir', got '$other'")
    }
    handles.foreach(live.add)
    scopes.get.headOption.foreach(s => handles.foreach(s.add))
    val probe = planProbe.get()
    if (probe != null) probe(df, out)
    out
  }

  /** Lazy sibling of [[cp]] (local backend): the returned frame is
    * MARKED for localCheckpoint but not yet materialized — the
    * caller's first action over it (e.g. a convergence probe that
    * must read every row anyway) computes, caches and
    * lineage-truncates in that ONE job, where eager cp + probe pays
    * two. The caller must run one single-scan action over the frame
    * before reading it twice: a union of two scans of an
    * unmaterialized checkpoint can compute partitions twice before
    * the cache lands. Dir backend falls back to eager [[cp]] — the
    * parquet write IS the materialization there. Tracked for release
    * exactly like [[cp]].
    */
  def cpLazy(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val backend =
      try spark.conf.get("spark.graft.scratch", "local")
      catch { case _: Throwable => "local" }
    if (backend != "local") cp(df)
    else {
      val out = df.localCheckpoint(eager = false)
      val handles = leafHandles(out).collect { case r: RddHandle => r }
      handles.foreach(live.add)
      scopes.get.headOption.foreach(s => handles.foreach(s.add))
      val probe = planProbe.get()
      if (probe != null) probe(df, out)
      out
    }
  }

  /** Materialize `df` once, then apply its presentation sort over the
    * stored rows. A global `orderBy` plans a range exchange, and range
    * partitioning SAMPLES its child to compute partition bounds — a
    * complete second execution of the pre-sort plan (the sample job,
    * then the shuffle-map job). When the body is expensive row-local
    * work with no shuffle of its own (JSON synth/parse, per-doc
    * shingle hashing, codec decode), that double execution costs the
    * whole query again; materializing the (already narrow) RESULT
    * first lets both passes read stored rows instead. At production
    * scale the same trade holds: one write+read of the reduced result
    * against a second full pass over the corpus-wide body (§8 of the
    * optimization playbook — decide over stored proxies, never
    * recompute the heavy pass). Row set and schema are unchanged —
    * this is `cp` + `orderBy`, lifecycle-tracked like any scratch
    * frame.
    */
  def cpSorted(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    cp(df).orderBy(cols: _*)

  /** Release tracked scratch storage behind the given frames. The
    * frames must not be read again (the storage IS the data). Only
    * handles this object tracked are touched — feeding an arbitrary
    * parquet-reading frame here deletes nothing.
    */
  def free(dfs: DataFrame*): Unit = dfs.foreach { df =>
    leafHandles(df).foreach { h => if (live.remove(h)) h.release() }
  }

  /** Materialize an operator's (small) final frame, then free the
    * intermediate materializations it consumed.
    */
  def seal(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = cp(result)
    free(intermediates: _*)
    out
  }

  /** Session-level sweep: release every tracked materialization
    * JVM-WIDE. Call only from a single-threaded driver, when all
    * frames previously returned by graft operators are fully consumed
    * (e.g. between bench queries) — see the class concurrency
    * contract; concurrent consumers use [[scoped]] instead.
    */
  def releaseAll(): Unit = {
    val it = live.iterator()
    while (it.hasNext) {
      it.next().release()
      it.remove()
    }
  }

  /** Number of tracked live materializations (spec hook). */
  def liveCount: Int = live.size()
}
