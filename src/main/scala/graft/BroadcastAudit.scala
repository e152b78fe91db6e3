package graft

import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
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
  * hint). This main sweeps EVERY SparkEntry query's pre-execution
  * physical plan (the static decisions — AQE's runtime broadcast
  * conversions are based on REAL shuffle sizes and cannot carry the
  * underestimate) and reports each broadcast exchange whose subtree
  * contains a Generate, for human adjudication: a broadcast of an
  * exploded frame is only safe when the explode is bounded by
  * construction (a constants-sized dimension), never when it scales
  * with the corpus.
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
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan match {
            case a: AdaptiveSparkPlanExec => a.initialPlan
            case p => p
          }
          def walk(p: SparkPlan): Unit = {
            p match {
              case b: BroadcastExchangeLike =>
                val gens = b.collect { case g: GenerateExec => g }
                if (gens.nonEmpty) {
                  findings += 1
                  println(s"[audit] FINDING $name: broadcast over a Generate subtree " +
                    s"(${gens.map(_.generator.prettyName).mkString(", ")}):")
                  println(b.treeString.linesIterator.take(12).mkString("\n"))
                }
              case _ =>
            }
            p.children.foreach(walk)
            p.subqueries.foreach(walk)
          }
          walk(plan)
          plan.subqueries.foreach(walk)
          println(s"[audit] $name scanned")
        } catch { case e: Throwable =>
          errors += 1
          println(s"[audit] $name ERROR: ${e.getMessage}")
        }
        Scratch.releaseAll()
      }
    println(s"[audit] findings=$findings errors=$errors")
  }
}
