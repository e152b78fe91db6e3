package graft

/** Lifecycle contract of graft.Scratch (see its class doc): scoped
  * release for concurrent consumers, whole-JVM release for
  * single-threaded drivers.
  */
class ScratchSpec extends SparkSpec {

  test("scoped frees exactly the scope's checkpoints; outer checkpoints stay readable") {
    import spark.implicits._
    Scratch.releaseAll()
    val outer = Scratch.cp(Seq(1L, 2L).toDF("v"))
    val before = Scratch.liveCount
    val inner = Scratch.scoped {
      val t = Scratch.cp(Seq(3L).toDF("v"))
      assert(Scratch.liveCount == before + 1)
      // consume INSIDE the scope — the contract
      t.collect().map(_.getLong(0)).toSeq
    }
    assert(inner == Seq(3L))
    // the scope's checkpoint is gone, the outer one survives the close
    assert(Scratch.liveCount == before)
    assert(outer.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    Scratch.free(outer)
  }

  test("nested scopes release innermost-first without touching the enclosing scope") {
    import spark.implicits._
    Scratch.releaseAll()
    Scratch.scoped {
      val a = Scratch.cp(Seq(10L).toDF("v"))
      val afterA = Scratch.liveCount
      Scratch.scoped {
        val b = Scratch.cp(Seq(20L).toDF("v"))
        assert(b.collect().head.getLong(0) == 20L)
      }
      // inner scope swept its own checkpoint only
      assert(Scratch.liveCount == afterA)
      assert(a.collect().head.getLong(0) == 10L)
    }
    assert(Scratch.liveCount == 0)
  }
}
