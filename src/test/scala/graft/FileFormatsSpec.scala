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

  private def roundTripRows(fmt: String, opts: Map[String, String]): Unit = {
    val work = java.nio.file.Files.createTempDirectory(s"graft_fmt_spec").toFile
    try {
      val orig = Tables.events(spark, sfDir)
        .select("event_id", "user_id", "event_type", "value", "props", "ts_ms")
      orig.write.mode("overwrite").options(opts).format(fmt).save(work.toString)
      val back = spark.read.schema(FileFormats.EventSchema)
        .options(opts + ("mode" -> "FAILFAST")).format(fmt).load(work.toString)
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
    roundTripRows("json", Map.empty)
  }

  test("src_csv: CSV round-trip is row-exact through quoting/escaping") {
    roundTripRows("csv", Map("header" -> "true"))
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
