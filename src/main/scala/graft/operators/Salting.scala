package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins (SURVEY.md §4). AQE's skew-join
  * split handles most cases at runtime; salting is the static fix when
  * one key dominates so heavily that even split sub-partitions of it
  * overwhelm an executor, or when the skewed side feeds a groupBy that
  * AQE cannot split (aggregation skew).
  *
  * Mechanics: the big side gets a deterministic salt in [0, salts)
  * derived from a caller-chosen discriminator column (NOT the join
  * key — the point is to spread identical keys); the small side is
  * replicated once per salt value; the join key becomes (key, salt).
  * Result is row-identical to the unsalted join; the hot key's rows
  * now land on `salts` reducers instead of one.
  */
object Salting {

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key
    * across `salts` partitions. `discriminator` must be a big-side
    * column (or expression) that varies within a key group.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      discriminator: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val bigS = big.withColumn("__salt", pmod(hash(discriminator), lit(salts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt),
    * then final aggregate on key — the map-side-combine idea made
    * explicit for aggregates Spark cannot partially combine (e.g.
    * exact distinct via sets). `partialAgg` and `finalAgg` must
    * compose associatively.
    */
  def saltedAgg(df: DataFrame, key: String, discriminator: Column, salts: Int)(
      partialAgg: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(hash(discriminator), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(partialAgg.head, partialAgg.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
}
