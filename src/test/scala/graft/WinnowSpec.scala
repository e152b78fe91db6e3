package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Pins winnowing's two load-bearing properties (Schleimer et al.
  * 2003): the detection guarantee at t = K + W − 1 tokens, and the
  * sub-linear selection density that justifies the smaller index.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fpsOf(docs: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    graft.functions.GraftFunctions.register(spark)
    TextOps.winnowFps(docs.toDF("doc_id", "text")).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("fp")).toSet }
  }

  test("guarantee: docs sharing a K+W-1-token verbatim run share a fingerprint") {
    val run = (1 to TextOps.WinnowK + TextOps.WinnowW - 1)
      .map(i => s"shared$i").mkString(" ")
    val a = s"alpha beta gamma delta $run epsilon zeta eta theta"
    val b = s"one two three four five six $run seven eight nine ten"
    val fps = fpsOf(Seq(1L -> a, 2L -> b))
    assert((fps(1L) & fps(2L)).nonEmpty,
      "a shared 8-token run selected no common fingerprint")
  }

  test("no shared k-gram, no shared fingerprint") {
    val a = (1 to 40).map(i => s"left$i").mkString(" ")
    val b = (1 to 40).map(i => s"right$i").mkString(" ")
    val fps = fpsOf(Seq(1L -> a, 2L -> b))
    assert((fps(1L) & fps(2L)).isEmpty)
  }

  test("dedup_winnow_inc: guarded-broadcast plan and merge-pinned fallback are row-identical") {
    graft.functions.GraftFunctions.register(spark)
    val guarded = TextOps.dedupWinnowInc(spark, sfDir).collect().toSeq
    val fallback = TextOps.dedupWinnowIncWith(spark, sfDir, 0L).collect().toSeq
    assert(guarded.nonEmpty)
    assert(guarded == fallback)
  }

  test("stream_winnow_inc matches the batch incremental row-for-row") {
    val streamed = streaming.StreamImport.runWinnowIncToCompletion(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = TextOps.dedupWinnowInc(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("graft_winnow (native O(n) deque) selects exactly the declarative formulation's set") {
    graft.functions.GraftFunctions.register(spark)
    val base = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hs", expr(
        s"graft_hash60_all(${TextOps.shinglesOfExpr(TextOps.WinnowK, "toks")})"))
    val diff = base.select(col("doc_id"),
        expr(s"sort_array(graft_winnow(hs, ${TextOps.WinnowW}))").as("a"),
        expr(s"sort_array(${TextOps.winnowSelectDeclarative("hs")})").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("density: the winnowed index holds well under the all-windows index, and every fp is a real k-gram hash") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val nFps = TextOps.winnowFps(docs).count()
    // the all-windows passage index dedup_substring builds (win width
    // SubstringW), compared per construction rule: winnowing selects
    // an expected 2/(W+1) = 40% of positions; 70% is the tripwire
    val nWins = docs.withColumn("toks", split(col("text"), " "))
      .select(explode(expr(
        s"transform(sequence(0, greatest(size(toks) - ${TextOps.WinnowK}, 0)), i -> i)")))
      .count()
    assert(nFps.toDouble / nWins < 0.7, s"winnow kept $nFps of $nWins hashes")
    // soundness: each selected fp appears among the doc's k-gram hashes
    val bad = TextOps.winnowFps(docs).as("f")
      .join(docs.withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          s"graft_hash60_all(transform(sequence(0, greatest(size(toks) - ${TextOps.WinnowK}, 0)), " +
            s"i -> concat_ws(' ', slice(toks, i + 1, ${TextOps.WinnowK}))))")).as("h"))
        .as("g"),
        col("f.doc_id") === col("g.doc_id") && col("f.fp") === col("g.h"),
        "left_anti")
      .count()
    assert(bad == 0, s"$bad selected fingerprints are not k-gram hashes of their doc")
  }
}
