package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{GenerateExec, RDDScanExec, SparkPlan}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike

/** Plan audit for the Generate-underestimate broadcast trap (round
  * 14): Catalyst's size estimate for Generate (explode/posexplode)
  * ignores the row multiplier, and a checkpointed LogicalRDD INHERITS
  * the original plan's estimate — so static planning can choose a
  * BroadcastHashJoin whose build side is explode-many-times bigger
  * than estimated. That exact shape took down the sharded-simhash key
  * self-join on a diverse corpus (210× explode, multi-GB broadcast
  * build at n=300 k — see TextOps.dedupSimhashShardedOf's merge
  * hint). AQE cannot save these: it only PROMOTES shuffle joins to
  * broadcast from real sizes, never demotes a static broadcast.
  *
  * Coverage (reworked round 15 — the r14 sweep audited only each
  * query's FINAL plan, and most operators seal through
  * Scratch.cp/seal, so every pre-seal segment's static decisions were
  * invisible behind a LogicalRDD stub): this main registers a
  * [[Scratch.planProbe]] and then RUNS every SparkEntry query, so
  * each materialization's input plan — the pre-seal segments where
  * the trap actually lives — is walked as it happens, plus the final
  * plan. It also tracks which checkpointed RDDs DESCEND from a
  * Generate (directly or through earlier checkpoints) and flags a
  * broadcast whose build side scans one of them: the checkpoint
  * inherits the underestimate, so it is the same trap one hop later.
  *
  * Cost: the queries EXECUTE (sealing is eager) — this is a full
  * gate-corpus sweep, not a plan-only pass; run it at sf0.01 where
  * that is ~minutes. Findings are for human adjudication in PLANS.md:
  * a broadcast of an exploded frame is only safe when the explode is
  * bounded by construction (a constants-sized dimension), never when
  * it scales with the corpus.
  *
  * Run: sbt "runMain graft.BroadcastAudit /root/testdata/sf0.01"
  */
object BroadcastAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val only = Graft.nameFilter("SPARK_GRAFT_AUDIT_ONLY")
    var findings = 0
    var errors = 0
    // checkpointed RDDs whose producing plan contained a Generate (or
    // read another gen-descended checkpoint) — RDD ids are
    // context-unique and never reused, so accumulation is safe
    val genRdds = scala.collection.mutable.Set[Int]()

    def staticPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

    /** One finding per broadcast exchange whose subtree contains a
      * Generate or scans a gen-descended checkpoint. `walk` recurses
      * into subqueries at every node, so no extra root-level subquery
      * pass (the r14 version double-visited and double-counted).
      */
    def sweep(name: String, where: String, plan: SparkPlan): Unit = {
      def walk(p: SparkPlan): Unit = {
        p match {
          case b: BroadcastExchangeLike =>
            val gens = b.collect { case g: GenerateExec => g }
            val inherited = b.collect {
              case s: RDDScanExec if genRdds.contains(s.rdd.id) => s
            }
            if (gens.nonEmpty || inherited.nonEmpty) {
              findings += 1
              val why =
                (gens.map(g => s"generate:${g.generator.prettyName}") ++
                  inherited.map(s => s"checkpointed-generate-descendant:rdd${s.rdd.id}"))
                  .mkString(", ")
              println(s"[audit] FINDING $name ($where): broadcast over $why:")
              println(b.treeString.linesIterator.take(12).mkString("\n"))
            }
          case _ =>
        }
        p.children.foreach(walk)
        p.subqueries.foreach(walk)
      }
      walk(plan)
    }

    /** Does this frame's plan carry a Generate, directly or via a
      * gen-descended checkpoint? Logical level — survives whatever
      * physical operator the generate lowered to.
      */
    def carriesGenerate(df: DataFrame): Boolean = {
      val lp = df.queryExecution.optimizedPlan
      lp.collectFirst {
        case _: org.apache.spark.sql.catalyst.plans.logical.Generate => ()
        case lr: LogicalRDD if genRdds.contains(lr.rdd.id) => ()
      }.nonEmpty
    }

    Scratch.planProbe.set { (input: DataFrame, output: DataFrame) =>
      val name = currentQuery
      try {
        sweep(name, "pre-seal", staticPlan(input))
        if (carriesGenerate(input)) {
          output.queryExecution.analyzed.collect {
            case lr: LogicalRDD => genRdds += lr.rdd.id
          }
        }
      } catch { case e: Throwable =>
        errors += 1
        println(s"[audit] $name probe ERROR: ${e.getMessage}")
      }
    }

    try {
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (name, fn) =>
          currentQuery = name
          try {
            val df = fn(spark, dir)
            sweep(name, "final", staticPlan(df))
            println(s"[audit] $name scanned")
          } catch { case e: Throwable =>
            errors += 1
            println(s"[audit] $name ERROR: ${e.getMessage}")
          }
          Scratch.releaseAll()
        }
    } finally Scratch.planProbe.set(null)
    // the KNOWN-WINDOW class adjudicates itself (r15 verdict item 5):
    // every banded/salt-replicated frame flows through KnownWindow
    // .guard, so max_factor ≤ ceiling here PROVES the residual
    // broadcast-over-Generate findings above are the bounded class —
    // a past-ceiling geometry would show pinned>0 (and its join would
    // not appear as a finding at all, being merge-pinned)
    val (kwFrames, kwMax, kwPins) = operators.KnownWindow.stats
    println(s"[audit] known-window: frames=$kwFrames max_factor=$kwMax " +
      s"ceiling=${operators.KnownWindow.MaxReplicationFactor} pinned=$kwPins")
    println(s"[audit] findings=$findings errors=$errors")
  }

  /** Query name in flight, read by the probe for attribution (the
    * sweep is single-threaded — Bench/Verify's driver contract).
    */
  @volatile private var currentQuery: String = "?"
}
