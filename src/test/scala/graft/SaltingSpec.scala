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
