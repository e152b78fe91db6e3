package graft

import graft.sources.{QueueHub, RawIngest}
import graft.streaming.StreamImport
import org.apache.spark.sql.functions._

class QueueSourceSpec extends SparkSpec {

  test("graft-queue DSv2 source streams published raw records through the import pipeline") {
    import spark.implicits._
    val subject = "zeebe-export-test"
    QueueHub.clear(subject)
    // the raw subject payloads the reference would receive from NATS
    val raw = RawIngest.rawRecords(spark, sfDir).as[String].collect()
    val stream = spark.readStream.format("graft-queue")
      .option("subject", subject).load()
    val parsed = RawIngest.parse(stream)
    val q = parsed.writeStream
      .outputMode("append").format("memory").queryName("queue_parsed")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_q_").toString)
      .start()
    // publish in two chunks — two micro-batches off the subject
    val (c1, c2) = raw.splitAt(raw.length / 2)
    QueueHub.publish(subject, c1.toIndexedSeq)
    q.processAllAvailable()
    val afterFirst = spark.table("queue_parsed").count()
    assert(afterFirst > 0 && afterFirst < raw.length)
    QueueHub.publish(subject, c2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("queue_parsed")
    // streamed parse == batch parse (same records, same extraction)
    val expected = RawIngest.impRawIngest(spark, sfDir)
    assert(got.count() == expected.count())
    val diff = got.select(expected.columns.map(col): _*)
      .exceptAll(expected).count()
    assert(diff == 0, "streamed parse differs from batch parse")
  }

  test("queue source requires a subject option") {
    val e = intercept[Exception] {
      spark.readStream.format("graft-queue").load()
        .writeStream.format("console").start()
    }
    assert(e.getMessage.toLowerCase.contains("subject"))
  }
}
