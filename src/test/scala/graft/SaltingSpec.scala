package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {

  test("saltedJoin equals the plain join on pathologically skewed data") {
    import spark.implicits._
    // 10k rows, 95% share one key — the shape that hot-spots a reducer
    val big = spark.range(10000)
      .select(when(col("id") % 100 < 95, 1L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (5L, "cold5"), (97L, "cold97"))
      .toDF("k", "label")
    val salted = Salting.saltedJoin(big, small, "k", col("payload"), 8)
    val plain = big.join(small, "k")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin spreads the hot key across partitions") {
    import spark.implicits._
    val big = spark.range(8000).select(lit(1L).as("k"), col("id").as("payload"))
    val small = Seq((1L, "hot")).toDF("k", "label")
    val salted = Salting.saltedJoin(big, small, "k", col("payload"), 8)
      .repartition(8, col("k"), pmod(hash(col("payload")), lit(8)))
    val sizes = salted.groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    // unsalted, all 8000 rows share one reducer; salted, no partition
    // should hold more than ~1/4 of the data
    assert(sizes.length > 1 && sizes.max < 4000,
      s"hot key not spread: ${sizes.mkString(",")}")
  }

  test("AQE skew-join split fires on a hot key (the runtime path salting backstops)") {
    // Graft.session claims adaptive skew handling; prove the config
    // path actually fires. A child session scopes the lowered split
    // thresholds (production values would never split a toy corpus).
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    // keep the join an SMJ so there is a shuffle to split
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    val big = s.range(40000)
      .select(when(col("id") % 100 < 97, 1L).otherwise(col("id") % 100).as("k"),
        concat(lit("pad_pad_pad_pad_pad_"), col("id")).as("payload"))
    val dim = s.range(100).select(col("id").as("k"), concat(lit("d"), col("id")).as("label"))
    val joined = big.join(dim, "k")
    // collect() runs joined's OWN QueryExecution (count() would build a
    // derived aggregate and leave this plan un-executed, AQE unfired)
    assert(joined.collect().length == 40000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not split the skewed partition:\n$plan")
  }

  test("LSH band-bucket salt-split: candidates identical; one-template hot bucket spreads <= 4x median") {
    import graft.operators.TextOps
    graft.functions.GraftFunctions.register(spark)
    // row-identity on the normal spec corpus (salting must be invisible)
    val salted0 = TextOps.minhashCandidatesSaltSplit(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain0 = TextOps.minhashCandidates(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted0 == plain0,
      s"salt-split changed the candidate set: ${salted0.size} vs ${plain0.size}")
    assert(plain0.nonEmpty, "no candidates at spec scale — vacuous")
    // STRESS: one dominant template — every doc lands in ONE band
    // bucket per band, the pathological shape PLANS.md tracked
    val n = 160L; val saltS = 8
    val tmp = java.nio.file.Files.createTempDirectory("graft_tmpl_").toString
    spark.range(n).select(col("id").as("doc_id"),
        lit("the very same boilerplate template text stamped onto every single document of this stress corpus again and again").as("text"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.minhashCandidatesSaltSplit(spark, tmp, saltS).collect()
    // complete candidate set: every pair, at full band agreement
    assert(got.length == (n * (n - 1) / 2).toInt,
      s"expected all pairs, got ${got.length}")
    assert(got.forall(_.getLong(2) == 4L), "a pair lost band agreement under salting")
    // straggler bound: the hot bucket's rows now split by
    // hash(doc_id) % S — no sub-bucket (= reducer share of the former
    // single hot key) may exceed 4x the median sub-bucket
    val sizes = spark.range(n)
      .select(pmod(hash(col("id")), lit(saltS)).as("salt"))
      .groupBy("salt").count().collect().map(_.getLong(1)).sorted
    assert(sizes.length == saltS, s"some salt never populated: ${sizes.length} of $saltS")
    val median = sizes(sizes.length / 2)
    assert(sizes.last <= 4 * median,
      s"straggler sub-bucket ${sizes.last} > 4x median $median: ${sizes.mkString(",")}")
  }

  test("saltedAgg two-phase aggregation matches direct aggregation") {
    import spark.implicits._
    val df = spark.range(5000)
      .select(lit(7L).as("k"), (col("id") % 50).as("v"))
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), countDistinct("v").as("d")).collect().head
    val salted = Salting.saltedAgg(df, "k", col("v"), 16)(
      Seq(sum("v").as("ps"), collect_set("v").as("pd")),
      Seq(sum("ps").as("s"), size(array_distinct(flatten(collect_list("pd")))).cast("long").as("d")))
      .collect().head
    assert(salted.getAs[Long]("s") == direct.getAs[Long]("s"))
    assert(salted.getAs[Long]("d") == direct.getAs[Long]("d"))
  }
}
