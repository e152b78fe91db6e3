package graft

import graft.operators.LayoutOps
import org.apache.spark.sql.functions._

/** Measures the point of the Morton key with the metric data skipping
  * actually uses: for a single-dimension predicate, how many
  * partitions' min/max boxes must be read? A u-sorted layout answers
  * u-predicates with ~1 partition but h-predicates with ALL of them
  * (h unbounded per partition), and vice versa; the z layout bounds
  * BOTH, so over a mixed workload it reads strictly fewer. (Total
  * bounding-box AREA is the wrong metric — any contiguous-range
  * layout tiles the plane, so areas come out ~equal; the first cut of
  * this spec measured exactly that.)
  */
class LayoutOpsSpec extends SparkSpec {

  private val P = 16

  private def boxes(layoutCol: String): Array[(Long, Long, Long, Long)] =
    LayoutOps.layoutBy(Tables.events(spark, sfDir), layoutCol, P)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("u").as("ulo"), max("u").as("uhi"),
        min("h").as("hlo"), max("h").as("hhi"))
      .collect()
      .map(r => (r.getAs[Long]("ulo"), r.getAs[Long]("uhi"),
        r.getAs[Long]("hlo"), r.getAs[Long]("hhi")))

  /** Mean partitions whose stats-box intersects `col = value`, over
    * every distinct value of each dimension, averaged across the two
    * single-dimension workloads.
    */
  private def meanTouched(layoutCol: String,
      us: Seq[Long], hs: Seq[Long]): Double = {
    val bs = boxes(layoutCol)
    val tu = us.map(x => bs.count { case (ulo, uhi, _, _) => ulo <= x && x <= uhi }).sum
    val th = hs.map(x => bs.count { case (_, _, hlo, hhi) => hlo <= x && x <= hhi }).sum
    tu.toDouble / us.size / 2 + th.toDouble / hs.size / 2
  }

  test("z-order layout reads fewer partitions than either single-column layout on a mixed single-dim predicate workload") {
    val base = LayoutOps.zKeyed(Tables.events(spark, sfDir))
    val us = base.select("u").distinct().collect().map(_.getAs[Long]("u")).toSeq
    val hs = base.select("h").distinct().collect().map(_.getAs[Long]("h")).toSeq
    val z = meanTouched("z", us, hs)
    val u = meanTouched("u", us, hs)
    val h = meanTouched("h", us, hs)
    assert(z < u, s"z layout ($z) not better than user-only layout ($u)")
    assert(z < h, s"z layout ($z) not better than hour-only layout ($h)")
  }

  test("z-order layout: REAL parquet row-group stats skip strictly more rows than either single-column layout") {
    // the partitions-touched test above measures the designed effect
    // on the key's own boxes; this one measures it where production
    // skipping actually happens — parquet footer min/max stats under
    // a pushed-down predicate. Each layout is WRITTEN to parquet
    // (repartitionByRange + sortWithinPartitions, the real write
    // path), then re-read with single-dimension equality predicates;
    // the scan's numOutputRows metric counts exactly the rows that
    // survived row-group skipping, so "strictly fewer rows read" is
    // asserted on the engine's own metric, not a model of it.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val work = java.nio.file.Files.createTempDirectory("graft_zlayout_").toFile
    try {
      def write(layoutCol: String): String = {
        val d = s"$work/$layoutCol"
        LayoutOps.layoutBy(Tables.events(spark, sfDir), layoutCol, P)
          .write.mode("overwrite").parquet(d)
        d
      }
      def rowsRead(dir: String, cond: org.apache.spark.sql.Column): Long = {
        val df = spark.read.parquet(dir).filter(cond)
        df.collect()
        val scans = df.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s
        }
        assert(scans.nonEmpty && scans.forall(_.metadata("PushedFilters") != "[]"),
          "the predicate must reach the parquet scan for stats skipping to exist")
        scans.map(_.metrics("numOutputRows").value).sum
      }
      val zDir = write("z"); val uDir = write("u"); val hDir = write("h")
      val base = LayoutOps.zKeyed(Tables.events(spark, sfDir))
      def sample(c: String): Seq[Long] = {
        val all = base.select(c).distinct().collect()
          .map(_.getAs[Long](c)).sorted.toSeq
        val step = math.max(1, all.size / 8)
        all.indices.collect { case i if i % step == 0 => all(i) }
      }
      val us = sample("u"); val hs = sample("h")
      def mixedWorkload(dir: String): Long =
        us.map(x => rowsRead(dir, col("u") === x)).sum * hs.size +
          hs.map(x => rowsRead(dir, col("h") === x)).sum * us.size
      val z = mixedWorkload(zDir)
      val u = mixedWorkload(uDir)
      val h = mixedWorkload(hDir)
      assert(z < u, s"z layout read $z rows vs user-only layout $u on the mixed workload")
      assert(z < h, s"z layout read $z rows vs hour-only layout $h on the mixed workload")
      // and each single-column layout certifies the harness: it must
      // skip on ITS OWN dimension (vs the total corpus size per probe)
      val total = Tables.events(spark, sfDir).count()
      assert(us.map(x => rowsRead(uDir, col("u") === x)).sum < total * us.size,
        "u-sorted parquet did not skip any row groups on u predicates — stats harness broken")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(work)
    }
  }

  test("the Morton key is a bijective interleave of the normalized dimensions") {
    // decode the key back to (a, b) and compare against the keyed
    // frame's own columns — a bit dropped or doubled anywhere breaks it
    def deinterleave(odd: Int): String =
      (0 until LayoutOps.ZBits).map(j =>
        s"shiftleft(shiftright(z, ${2 * j + odd}) & 1, $j)").mkString("(", " + ", ")")
    val bad = LayoutOps.zKeyed(Tables.events(spark, sfDir))
      .withColumn("da", expr(deinterleave(0)))
      .withColumn("db", expr(deinterleave(1)))
      .filter(col("da") =!= col("a") || col("db") =!= col("b"))
      .count()
    assert(bad == 0)
  }

  test("opt_table_stats: exact values, and the plan has NO Expand and one-column pruned scans") {
    val df = LayoutOps.optTableStats(spark, sfDir)
    val got = df.collect().map(r => r.getAs[String]("column_name") -> r).toMap
    val li = Tables.lineitem(spark, sfDir)
    val n = li.count()
    // exact ndv recomputed the naive way (fine at spec scale)
    def ndv(c: String) = li.select(c).distinct().count()
    assert(got("l_orderkey").getAs[Long]("n_rows") == n)
    assert(got("l_orderkey").getAs[Long]("ndv") == ndv("l_orderkey"))
    assert(got("l_partkey").getAs[Long]("ndv") == ndv("l_partkey"))
    assert(got("l_quantity").getAs[Long]("min_num") == 1L &&
      got("l_quantity").getAs[Long]("max_num") == 50L)
    assert(got("l_returnflag").getAs[String]("min_str") != null &&
      got("l_returnflag").getAs[Long]("n_null") == 0L)
    // the plan contract: per-column groupBy branches, NEVER the
    // multi-count-distinct Expand (which replays the scan k×), and
    // each branch's parquet scan pruned to exactly its own column
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(!plan.contains("Expand"), "stats plan must not use Expand")
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(reads.size == 4, s"expected 4 column-pruned scans, got $reads")
    assert(reads.forall(s => s.count(_ == ':') == 1),
      s"every stats scan must read exactly one column: $reads")
  }
}
