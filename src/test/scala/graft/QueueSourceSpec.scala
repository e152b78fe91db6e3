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

  test("src_queue composes end-to-end: subject → bounded entity fold → merging sink == batch entity") {
    // the reference's full NATS→parse→Inflight*Manager→JPA loop
    // (NatsConsumer.java:39-106) as one composed pipeline: raw JSON
    // strings off the DSv2 subject, parsed once, folded by the BOUNDED
    // production fold, landed through the incarnation-merging sink —
    // and the final table equals the batch entity.
    import spark.implicits._
    val recs = StreamImport.toRecs(Tables.events(spark, sfDir)).collect()
      .sortBy(r => (r.ts_ms, r.event_id)) // in-order: nothing beyond the watermark
    val subject = "zeebe-export-fold"
    QueueHub.clear(subject)
    def js(r: StreamImport.Rec): String =
      s"""{"event_id":${r.event_id},"ts_ms":${r.ts_ms},"user_id":${r.user_id},""" +
        s""""event_type":"${r.event_type}","value":${r.value},"k":${r.k}}"""
    val recSchema = org.apache.spark.sql.Encoders.product[StreamImport.Rec].schema
    val stream = spark.readStream.format("graft-queue").option("subject", subject).load()
    val events = stream.select(from_json(col("value"), recSchema).as("r")).select("r.*")
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_qfold_").toString + "/t"
    val merge = StreamImport.foldMerge(StreamImport.transferFold)
    val q = StreamImport.transfersStream(events) // bounded production default
      .writeStream.outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_qfoldchk_").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.TenantUpsertSink.upsert(sinkDir, b, "entity_key", Some(merge))
      }
      .start()
    recs.grouped(math.max(recs.length / 3, 1)).foreach { chunk =>
      QueueHub.publish(subject, chunk.map(js).toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val cols = Seq("transfer_key", "tenant", "started_ms", "completed_ms",
      "amount", "last_click_value", "status", "n_events")
    val streamed = graft.streaming.TenantUpsertSink.readCurrent(spark, sinkDir).get
      .select(explode(col("rows")).as("r")).select("r.*")
      .select(cols.map(col): _*).orderBy("transfer_key").collect()
    val batch = graft.operators.ImporterCore.impEntityTransfers(spark, sfDir)
      .select(cols.map(col): _*).collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.toSeq == b.toSeq, s"key ${s.get(0)}: queue=${s.toSeq} batch=${b.toSeq}")
    }
  }

  test("queue source requires a subject option") {
    val e = intercept[Exception] {
      spark.readStream.format("graft-queue").load()
        .writeStream.format("console").start()
    }
    assert(e.getMessage.toLowerCase.contains("subject"))
  }
}
