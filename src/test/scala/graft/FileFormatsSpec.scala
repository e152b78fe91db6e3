package graft

import graft.sources.FileFormats
import org.apache.spark.sql.functions._

/** Pins the format adapters at ROW level (the gate digest is
  * column-complete but aggregated — a compensating pair of errors
  * could cancel there; row parity can't), the FAILFAST ingest
  * contract, and the streaming quantile maintainer's equivalence to
  * the batch sketch.
  */
class FileFormatsSpec extends SparkSpec {

  private def eventRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String, Double, String, Long)] =
    df.select("event_id", "user_id", "event_type", "value", "props", "ts_ms")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Double]("value"),
        r.getAs[String]("props"), r.getAs[Long]("ts_ms"))).toSet

  private def roundTripRows(fmt: String, writeOpts: Map[String, String],
      readOpts: Map[String, String]): Unit = {
    val work = java.nio.file.Files.createTempDirectory(s"graft_fmt_spec").toFile
    try {
      val orig = Tables.events(spark, sfDir)
        .select("event_id", "user_id", "event_type", "value", "props", "ts_ms")
      orig.write.mode("overwrite").options(writeOpts).format(fmt).save(work.toString)
      val back = spark.read.schema(FileFormats.EventSchema)
        .options(readOpts + ("mode" -> "FAILFAST")).format(fmt).load(work.toString)
      assert(eventRows(back) == eventRows(orig),
        s"$fmt round-trip altered at least one row")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(work)
    }
  }

  test("src_jsonl: JSON-lines round-trip is row-exact (longs, doubles, embedded JSON strings)") {
    roundTripRows("json", Map.empty, Map.empty)
  }

  test("src_csv: CSV round-trip is row-exact through quoting/escaping") {
    roundTripRows("csv", FileFormats.CsvWriteOpts, FileFormats.CsvReadOpts)
  }

  test("src_csv: pinned sentinels keep null and empty string distinct through the text form") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_fmt_null").toFile
    try {
      // props: one null, one empty, one ordinary value — with default
      // CSV options null and '' both render as the empty field and
      // the round-trip would conflate them
      val orig = Seq(
        (1L, 10L, "click", 1.5, null.asInstanceOf[String], 100L),
        (2L, 11L, "view", 2.5, "", 200L),
        (3L, 12L, "click", 3.5, """{"k": 7, "s": "a,b\"c"}""", 300L))
        .toDF("event_id", "user_id", "event_type", "value", "props", "ts_ms")
      orig.write.mode("overwrite").options(FileFormats.CsvWriteOpts).csv(work.toString)
      val back = spark.read.schema(FileFormats.EventSchema)
        .options(FileFormats.CsvReadOpts + ("mode" -> "FAILFAST")).csv(work.toString)
        .orderBy("event_id")
        .select("props").collect().map(_.getAs[String]("props")).toSeq
      assert(back == Seq(null, "", """{"k": 7, "s": "a,b\"c"}"""),
        s"null/empty/value not preserved: $back")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(work)
    }
  }

  test("explicit-schema FAILFAST read rejects a malformed row loudly") {
    val work = java.nio.file.Files.createTempDirectory("graft_fmt_bad").toFile
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(work.toString, "part-00000.json"),
        """{"event_id": 1, "user_id": 2, "event_type": "click", "value": 1.5, "props": "{}", "ts_ms": 10}
          |{"event_id": "NOT_A_LONG_AT_ALL", "user_id": {}, "event_type": 7}
          |""".stripMargin)
      val back = spark.read.schema(FileFormats.EventSchema)
        .option("mode", "FAILFAST").json(work.toString)
      val e = intercept[Exception] { back.collect() }
      assert(e.getMessage != null)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(work)
    }
  }

  test("stream_quantile: the maintained bin table derives the batch sketch's exact percentiles") {
    val streamed = streaming.StreamImport.runQuantileToCompletion(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.ApproxOps.sketchQuantile(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }
}
