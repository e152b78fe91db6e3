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

  /** A child session on the durable backend, rooted in a fresh temp
    * dir so assertions about what exists on disk are exact.
    */
  private def dirSession(root: String) = {
    val s = spark.newSession()
    functions.GraftFunctions.register(s)
    s.conf.set("spark.graft.scratch", "dir")
    s.conf.set("spark.graft.scratch.dir", root)
    s
  }

  private def scratchDirs(root: String): Seq[String] = {
    val f = new java.io.File(root)
    if (!f.exists()) Nil else f.listFiles().map(_.getName).toSeq.sorted
  }

  test("dir backend: cp round-trips data through scratch parquet; free deletes exactly that dir") {
    Scratch.releaseAll()
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_spec_").toString
    val s = dirSession(root)
    import s.implicits._
    val before = Scratch.liveCount
    val df = Scratch.cp(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    assert(Scratch.liveCount == before + 1)
    assert(scratchDirs(root).size == 1, "one scratch dir per cp")
    // the frame reads from scratch, and reads it correctly
    assert(df.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    Scratch.free(df)
    assert(Scratch.liveCount == before)
    assert(scratchDirs(root).isEmpty, "free removed the scratch dir")
  }

  test("dir backend: seal frees intermediates' dirs but keeps the result's; releaseAll sweeps the rest") {
    Scratch.releaseAll()
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_spec_").toString
    val s = dirSession(root)
    import s.implicits._
    val inter = Scratch.cp(Seq(1L, 2L, 3L).toDF("v"))
    val result = Scratch.seal(inter.groupBy().sum("v"), inter)
    assert(scratchDirs(root).size == 1, "intermediate dir freed, result dir kept")
    assert(result.collect().head.getLong(0) == 6L)
    Scratch.releaseAll()
    assert(scratchDirs(root).isEmpty)
    assert(Scratch.liveCount == 0)
  }

  test("dir backend: free never deletes ordinary parquet inputs it did not create") {
    Scratch.releaseAll()
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_spec_").toString
    val plain = java.nio.file.Files.createTempDirectory("graft_plain_parquet_").toString + "/t"
    val s = dirSession(root)
    import s.implicits._
    Seq(1L, 2L).toDF("v").write.parquet(plain)
    val reader = s.read.parquet(plain)
    Scratch.free(reader) // plain's path is an untracked DirHandle — must be a no-op
    assert(reader.count() == 2L, "untracked parquet survives free()")
  }

  test("dir backend: scoped sweeps the scope's scratch dirs") {
    Scratch.releaseAll()
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_spec_").toString
    val s = dirSession(root)
    import s.implicits._
    val got = Scratch.scoped {
      val t = Scratch.cp(Seq(7L).toDF("v"))
      assert(scratchDirs(root).size == 1)
      t.collect().head.getLong(0)
    }
    assert(got == 7L)
    assert(scratchDirs(root).isEmpty)
    assert(Scratch.liveCount == 0)
  }

  test("backends are result-identical through real cp/seal-using operators") {
    Scratch.releaseAll()
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_spec_").toString
    val durable = dirSession(root)
    // operators that lean on Scratch internally: minhash dedup (cp'd
    // signature frame + sealed pair result) and embedding dedup
    for (name <- Seq("dedup_minhash", "dedup_embed")) {
      val q = SparkEntry.queries(name)
      val local = q(spark, sfDir).collect().map(_.toString).sorted.toSeq
      val dir = q(durable, sfDir).collect().map(_.toString).sorted.toSeq
      assert(dir == local, s"$name differs between scratch backends")
      Scratch.releaseAll()
    }
    assert(scratchDirs(root).isEmpty, "releaseAll swept the durable scratch root")
  }

  test("unknown backend name fails fast") {
    val s = spark.newSession()
    s.conf.set("spark.graft.scratch", "s3-magic")
    import s.implicits._
    intercept[IllegalArgumentException] {
      Scratch.cp(Seq(1L).toDF("v"))
    }
  }
}
