package graft

import graft.streaming.StreamImport
import graft.streaming.StreamImport.Rec
import org.scalatest.funsuite.AnyFunSuite

/** The law the bounded-state design rests on: every entity fold is a
  * commutative monoid, so an evicted incarnation's accumulator and a
  * fresh restart recombine at the sink into EXACTLY the state a single
  * uninterrupted fold would have produced. Pure (no SparkSession) —
  * the law is about the fold functions themselves.
  */
class FoldMonoidSpec extends AnyFunSuite {

  private val types = Seq("signup", "purchase", "click", "view", "error", "other")

  private def randRecs(rnd: scala.util.Random, n: Int): Vector[Rec] =
    Vector.tabulate(n) { i =>
      Rec(event_id = i + 1, ts_ms = 1700000000000L + rnd.nextInt(100000),
        user_id = 1 + rnd.nextInt(3), event_type = types(rnd.nextInt(types.length)),
        value = math.round(rnd.nextDouble() * 10000) / 100.0, k = rnd.nextInt(100))
    }

  private def check[S, O](name: String, f: StreamImport.EntityFold[S, O]): Unit =
    test(s"$name: merge(fold(xs), fold(ys)) == fold(xs ++ ys) for random splits; empty is a unit") {
      val rnd = new scala.util.Random(42)
      for (trial <- 1 to 200) {
        val recs = randRecs(rnd, 1 + rnd.nextInt(40))
        val cut = rnd.nextInt(recs.length + 1)
        val (xs, ys) = recs.splitAt(cut)
        val whole = recs.foldLeft(f.empty)(f.step)
        val sx = xs.foldLeft(f.empty)(f.step)
        val sy = ys.foldLeft(f.empty)(f.step)
        val merged = f.merge(sx, sy)
        assert(merged == whole, s"trial $trial split $cut: $merged != $whole")
        assert(f.merge(sy, sx) == whole, s"trial $trial: merge is not commutative")
        assert(f.merge(f.empty, whole) == whole && f.merge(whole, f.empty) == whole,
          s"trial $trial: empty is not a unit")
        // associativity over a 3-way split (the shape repeated
        // evictions produce: closed ⊕ closed ⊕ open)
        val cut2 = cut + rnd.nextInt(recs.length - cut + 1)
        val (ys1, ys2) = recs.drop(cut).splitAt(cut2 - cut)
        val s1 = ys1.foldLeft(f.empty)(f.step)
        val s2 = ys2.foldLeft(f.empty)(f.step)
        assert(f.merge(f.merge(sx, s1), s2) == f.merge(sx, f.merge(s1, s2)),
          s"trial $trial: merge is not associative")
        assert(f.render(7L, merged) == f.render(7L, whole))
      }
    }

  check("transfers", StreamImport.transferFold)
  check("txnreq", StreamImport.txnreqFold)
  check("batches", StreamImport.batchFold)
  check("wide", StreamImport.wideFold)
  check("topn", StreamImport.topnFold)
}
