package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 `mm_pipeline`): media
  * payloads as opaque `binary` columns with a typed metadata struct,
  * decode / feature-extract / frame-sample as partition-batched
  * transforms — the Scala equivalent of a `mapInPandas` batch UDF.
  *
  * The container has no image/audio codecs, so THE DECODE STEP IS A
  * STUB: `decodeStub` produces deterministic fake frames from the
  * payload bytes. Everything around it — schema, binary column
  * handling, partition batching, feature shape, checksums — is real
  * and spec-tested; swapping `decodeStub` for a JNI/FFmpeg decoder
  * changes no plumbing.
  *
  * Scale posture: payloads never leave their partition (mapPartitions,
  * no shuffle until the final presentation agg); feature extraction is
  * embarrassingly parallel; metadata travels as a struct column so
  * pruning works when only meta is queried.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, n_frames: Int)
  case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class FrameFeature(doc_id: Long, frame_idx: Int, dim: Int, checksum: Long)

  private val Formats = Array("jpeg", "png", "wav", "mp4")

  /** Deterministic synthetic media attached to each document (the
    * test corpus ships no binaries): payload bytes derive from the
    * doc's md5, metadata from the doc id. Stands in for a real
    * `binary` + struct column pair read from parquet/lance.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).cast("binary").as("seed"))
      .as[(Long, Array[Byte])]
      .map { case (id, seed) =>
        val reps = 1 + (id % 8).toInt
        val payload = Array.fill(reps)(seed).flatten
        MediaRow(id, payload,
          MediaMeta(Formats((id % 4).toInt), 16 << (id % 3).toInt,
            16 << (id % 3).toInt, 1 + (id % 5).toInt))
      }
  }

  /** STUB — deterministic fake decoder. A real implementation decodes
    * `payload` per `meta.format` and emits `meta.n_frames` sampled
    * frames of `width*height` pixels; this fake derives an 8-float
    * feature per frame from the payload bytes so the downstream
    * plumbing is fully exercised and reproducible.
    */
  private[operators] def decodeStub(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] =
    Array.tabulate(meta.n_frames) { f =>
      Array.tabulate(8) { i =>
        val b = payload((f * 8 + i) % payload.length) & 0xff
        (b - 128).toFloat / 128f
      }
    }

  /** Frame features, partition-batched: the mapPartitions boundary is
    * where a real decoder would amortize codec init per partition
    * (exactly what mapInPandas gives Python UDFs).
    */
  def features(spark: SparkSession, dir: String): Dataset[FrameFeature] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      // per-partition "codec" init would go here
      rows.flatMap { r =>
        decodeStub(r.payload, r.meta).zipWithIndex.map { case (feat, idx) =>
          val checksum = feat.foldLeft(1469598103934665603L) { (acc, f) =>
            (acc ^ java.lang.Float.floatToIntBits(f)) * 1099511628211L
          }
          FrameFeature(r.doc_id, idx, feat.length, checksum)
        }
      }
    }
  }

  /** Driver-visible pipeline result (rows-only check — the decode is
    * stubbed, so no SQL oracle is claimed): one row per sampled frame.
    */
  def mmPipeline(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir).toDF()
      .orderBy("doc_id", "frame_idx")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_pipeline" -> (mmPipeline _))
}
