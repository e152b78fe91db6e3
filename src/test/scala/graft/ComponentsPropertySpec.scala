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

  test("pointer doubling: a 200-node path (diameter 199) converges inside the round cap") {
    import spark.implicits._
    val n = 200
    val nodes = (0L until n.toLong).toDF("doc_id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a_id", "b_id")
    // plain O(diameter) propagation would need 199 rounds and trip the
    // MaxRounds=50 loud failure; the shortcut closes in O(log d)
    val got = Components.connectedComponents(nodes, edges).collect()
    assert(got.length == n)
    assert(got.forall(_.getLong(1) == 0L), "every node must collapse to component 0")
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
}
