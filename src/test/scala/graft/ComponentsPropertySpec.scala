package graft

import graft.operators.Components

/** Property check: distributed min-label propagation == classic
  * union-find, over seeded random graphs (chains, cliques, isolated
  * nodes, cycles — shapes the corpus-derived spec can't force).
  */
class ComponentsPropertySpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("star contraction: a 200-node path (diameter 199) converges inside the round cap") {
    import spark.implicits._
    val n = 200
    val nodes = (0L until n.toLong).toDF("doc_id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a_id", "b_id")
    // plain O(diameter) propagation would need 199 rounds and trip the
    // MaxRounds=50 loud failure; large-star/small-star contraction
    // closes in O(log² n) — well under the cap even on the worst-case
    // path shape (dedup graphs are near-cliques and take 2-3)
    val got = Components.connectedComponents(nodes, edges).collect()
    assert(got.length == n)
    assert(got.forall(_.getLong(1) == 0L), "every node must collapse to component 0")
    val r = Components.lastRounds.get()
    assert(r > 0 && r <= 20, s"path contraction took $r rounds — contraction broken?")
  }

  test("connectedComponents matches union-find on 15 seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 15) {
      val n = 2 + rnd.nextInt(39)
      val m = rnd.nextInt(61)
      val edges = Seq.fill(m) {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(e => e._1 != e._2).distinct
      val nodes = (0L until n.toLong).toDF("doc_id")
      val edgeDf = edges.toDF("a_id", "b_id")
      val got = Components.connectedComponents(nodes, edgeDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(n, edges), s"trial $trial: n=$n edges=$edges")
    }
  }

  test("mergeComponents: untouched components keep labels; touched ones merge like a recompute") {
    import spark.implicits._
    // corpus: {10,11,12}, {20,21}, {30}, {40,41}
    val corpusNodes = Seq(10L, 11L, 12L, 20L, 21L, 30L, 40L, 41L).toDF("doc_id")
    val corpusEdges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (40L, 41L))
      .toDF("a_id", "b_id")
    val labels0 = Components.connectedComponents(corpusNodes, corpusEdges)
    // delta: doc 5 bridges into {40,41} with an id BELOW the old root
    // (the re-label case a naive label-carry gets wrong); doc 50 is a
    // new singleton
    val allNodes = Seq(5L, 10L, 11L, 12L, 20L, 21L, 30L, 40L, 41L, 50L)
      .toDF("doc_id")
    val delta = Seq((5L, 40L)).toDF("a_id", "b_id")
    val got = Components.mergeComponents(allNodes, labels0, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // untouched components: labels BYTE-stable vs the standing labeling
    val before = labels0.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (d <- Seq(10L, 11L, 12L, 20L, 21L, 30L))
      assert(got(d) == before(d), s"untouched doc $d re-labeled")
    // touched component re-rooted at the delta's smaller id
    assert(got(5L) == 5L && got(40L) == 5L && got(41L) == 5L)
    assert(got(50L) == 50L)
  }

  test("mergeComponents ≡ full recompute on 15 seeded random corpus+delta splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(1337)
    for (trial <- 1 to 15) {
      val n = 6 + rnd.nextInt(35)
      val n0 = 3 + rnd.nextInt(n - 4) // corpus ids < n0, delta ids >= n0
      val m = rnd.nextInt(71)
      val edges = Seq.fill(m) {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(e => e._1 != e._2).distinct
      val corpusEdges = edges.filter(e => e._1 < n0 && e._2 < n0)
      val deltaEdges = edges.filter(e => e._1 >= n0 || e._2 >= n0)
      val labels0 = Components.connectedComponents(
        (0L until n0.toLong).toDF("doc_id"),
        corpusEdges.toDF("a_id", "b_id"))
      val allNodes = (0L until n.toLong).toDF("doc_id")
      val merged = Components.mergeComponents(
          allNodes, labels0, deltaEdges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(merged == unionFind(n, edges),
        s"trial $trial: n=$n n0=$n0 edges=$edges")
    }
  }

  test("selectReps keeps the BEST copy, not the lowest id (the min-id rule's failure case)") {
    import spark.implicits._
    // cluster 0: lowest id is a LOW-quality truncation, the good copy
    // has a higher id — the quality argmax must pick 2, where the
    // min-id rule would keep 0. cluster 10: quality tie → longer doc
    // wins; cluster 20: full tie → min id as the deterministic break.
    val member = Seq(
      (0L, 0L, 0L, 12L), (1L, 0L, 0L, 9L), (2L, 0L, 1L, 80L),
      (10L, 10L, 1L, 50L), (11L, 10L, 1L, 70L),
      (20L, 20L, 1L, 60L), (21L, 20L, 1L, 60L),
      (30L, 30L, 0L, 5L)) // singleton keeps itself even below the gate
      .toDF("doc_id", "component", "q_rank", "n_tokens")
    val got = Components.selectReps(member).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rep_id"), r.getAs[Boolean]("keep"))).toMap
    assert(got(0L) == (2L, false) && got(1L) == (2L, false) && got(2L) == (2L, true))
    assert(got(10L) == (11L, false) && got(11L) == (11L, true))
    assert(got(20L) == (20L, true) && got(21L) == (20L, false))
    assert(got(30L) == (30L, true))
  }

  test("dedup_cluster_rep: exactly one keeper per cluster, and it dominates the ordering") {
    val rows = Components.dedupClusterRep(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byComp = rows.groupBy(_.getAs[Long]("component"))
    byComp.foreach { case (c, ms) =>
      val keepers = ms.filter(_.getAs[Boolean]("keep"))
      assert(keepers.length == 1, s"component $c has ${keepers.length} keepers")
      val rep = keepers.head
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("q_rank"), r.getAs[Long]("n_tokens"), -r.getAs[Long]("doc_id"))
      assert(ms.forall(m => Ordering[(Long, Long, Long)].lteq(key(m), key(rep))),
        s"component $c: keeper ${rep.getAs[Long]("doc_id")} is not the argmax")
      assert(ms.forall(_.getAs[Long]("rep_id") == rep.getAs[Long]("doc_id")))
    }
  }
}
