package graft

import graft.operators.BloomOps
import org.apache.spark.sql.functions._

/** Pins the Bloom family's guarantees: no false negatives, bounded
  * false-positive rate at the documented geometry, word-wise `bit_or`
  * mergeability (the union monoid), and — the operator's point —
  * opt_bloom_join's prune actually removing fact rows while the final
  * answer stays row-identical to the un-pruned join.
  */
class BloomOpsSpec extends SparkSpec {

  private lazy val probeHits: Map[(String, Long), Long] =
    BloomOps.sketchBloomProbe(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")) ->
        r.getAs[Long]("hit")).toMap

  private lazy val present: Set[(String, Long)] =
    Tables.events(spark, sfDir)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
      .filter(_._2 < BloomOps.ProbeUsers).toSet

  test("sketch_bloom has NO false negatives over the probe space") {
    assert(present.nonEmpty)
    val misses = present.filter(p => probeHits.getOrElse(p, 0L) == 0L)
    assert(misses.isEmpty, s"false negatives: ${misses.take(5)}")
  }

  test("sketch_bloom false-positive rate is within the geometry's bound") {
    val absent = probeHits.keySet -- present
    assert(absent.nonEmpty, "probe space must include absent ids")
    val fps = absent.count(p => probeHits(p) == 1L)
    // m=4096, k=4, n<=300 distinct ids per group => fill < 0.26,
    // expected FP rate < 0.5%; 10% is a loose regression tripwire
    assert(fps.toDouble / absent.size < 0.10,
      s"$fps false positives over ${absent.size} absent probes")
  }

  test("bloom word tables MERGE by bit_or (the union monoid)") {
    val events = Tables.events(spark, sfDir)
    graft.functions.GraftFunctions.register(spark)
    // split the stream by event-id parity, sketch each half, OR the
    // word tables together: must equal the whole corpus's sketch
    def table(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
      df.collect().map(r =>
        (r.getAs[String]("event_type"), r.getAs[Long]("word_idx")) ->
          r.getAs[Long]("bits")).toMap
    val whole = table(BloomOps.sketchBloom(spark, sfDir))
    val a = table(BloomOps.bloomWords(events.filter(col("event_id") % 2 === 0)))
    val b = table(BloomOps.bloomWords(events.filter(col("event_id") % 2 =!= 0)))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) | b.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("opt_bloom_join: the prune removes fact rows, keeps every match, and the answer is exact") {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orders = Tables.orders(spark, sfDir)
    val pruned = BloomOps.prunedOrders(spark, sfDir, cust)
    val total = orders.count()
    val prunedN = pruned.count()
    val matchesN = orders.join(cust, col("o_custkey") === col("c_custkey")).count()
    assert(prunedN < total, "bloom prune removed nothing")
    assert(prunedN >= matchesN, "bloom prune dropped a matching row")
    // answer exactness: bloom-pruned join == plain join, row for row
    val withBloom = BloomOps.optBloomJoin(spark, sfDir).collect().toSeq
    val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("long").as("n_orders"),
        graft.functions.Portable.moneyStr(
          sum(graft.functions.Portable.dec2(col("o_totalprice")))).as("sum_total"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(withBloom == plain)
  }

  test("opt_bloom_join: an EMPTY dimension prunes every fact row (no crash, no false positives)") {
    val emptyDim = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "NO_SUCH_SEGMENT").select("c_custkey")
    assert(BloomOps.prunedOrders(spark, sfDir, emptyDim).count() == 0,
      "an all-zero bloom must reject every key")
  }

  test("the broadcast bloom frame is ONE row of at most BloomWords entries") {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val bf = BloomOps.bloomFrameOf(cust, "c_custkey").collect()
    assert(bf.length == 1)
    assert(bf(0).getMap[Long, Long](0).size <= BloomOps.BloomWords)
  }

  test("ann_filtered: every neighbor shares its probe's label (the within-category contract)") {
    graft.functions.GraftFunctions.register(spark)
    val rows = graft.operators.VectorOps.annFiltered(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // within-category invariant via re-join to the raw label table
    val labels = Tables.embeddings(spark, sfDir).select("vec_id", "label")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("n_id")) == r.getAs[Int]("label"),
        s"cross-label neighbor for probe ${r.getAs[Long]("q_id")}")
      assert(r.getAs[Long]("rnk") <= 3)
    }
  }

  test("pipe_chunk: chunks cover every token and reconstruct the document") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val chunks = graft.operators.TrainOps.pipeChunk(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet == docs.keySet, "a document produced no chunks")
    val S = graft.operators.TrainOps.ChunkStride
    chunks.foreach { case (id, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("chunk_idx"))
      // stride-prefixes of all chunks but the last, plus the whole
      // last chunk, concatenate back to the original document
      val rebuilt = (ordered.dropRight(1).map(
        _.getAs[String]("chunk").split(" ", -1).take(S).mkString(" ")) :+
        ordered.last.getAs[String]("chunk")).mkString(" ")
      assert(rebuilt == docs(id), s"doc $id did not reconstruct")
    }
  }
}
