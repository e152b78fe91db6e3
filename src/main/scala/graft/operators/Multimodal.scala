package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 `mm_pipeline`): media
  * payloads as opaque `binary` columns with a typed metadata struct,
  * decode / feature-extract / frame-sample as partition-batched
  * transforms — the Scala equivalent of a `mapInPandas` batch UDF.
  *
  * The decode step is REAL for image and audio rows: `png` and `jpeg`
  * payloads are genuine encoded streams (the pure-JVM `javax.imageio`
  * codecs, no native libs) and `decodeImage` runs `ImageIO.read`,
  * deriving frame features from the actual decoded pixels — png
  * roundtrips pixel-exact, jpeg is honestly lossy (features come from
  * what the codec reconstructs). `wav` payloads are genuine RIFF/PCM
  * streams written and read back through `javax.sound.sampled.
  * AudioSystem` (also pure-JVM), with frame features tapped from the
  * decoded 16-bit samples. The one format with no JVM codec in this
  * container (mp4) still goes through `decodeStub`, which fakes
  * frames deterministically from the payload bytes; swapping it for
  * an FFmpeg decoder changes no plumbing.
  *
  * Scale posture: payloads never leave their partition (mapPartitions,
  * no shuffle until the final presentation agg); decode is
  * embarrassingly parallel and the mapPartitions boundary is where a
  * real codec amortizes init; metadata travels as a struct column so
  * pruning works when only meta is queried. `ImageIO`'s disk cache is
  * off — executor-side decode stays in-memory.
  */
object Multimodal {

  ImageIO.setUseCache(false)

  case class MediaMeta(format: String, width: Int, height: Int, n_frames: Int)
  case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class FrameFeature(doc_id: Long, frame_idx: Int, dim: Int, checksum: Long)

  private val Formats = Array("jpeg", "png", "wav", "mp4")

  /** Deterministic pixel pattern seeded by the doc's md5: the image a
    * png row's payload encodes. Channel mix keeps every pixel
    * dependent on the seed bytes so a decode that ignores the payload
    * cannot reproduce the features.
    */
  private[graft] def synthesizeImage(seed: Array[Byte], w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val r = seed(i % seed.length) & 0xff
        val g = seed((i * 7 + 3) % seed.length) & 0xff
        val b = (x * 31 + y * 17) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  private[graft] def encodePng(img: BufferedImage): Array[Byte] =
    encodeImage(img, "png")

  private[graft] def encodeImage(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"graft-mm: no JVM writer for $format")
    out.toByteArray
  }

  /** Deterministic PCM waveform seeded by the doc's md5: the audio a
    * wav row's payload encodes. Every 16-bit sample mixes two seed
    * bytes, so a decode that ignores the payload cannot reproduce the
    * features.
    */
  private[graft] def synthesizeWaveform(seed: Array[Byte], n: Int): Array[Short] =
    Array.tabulate(n) { i =>
      // index mixed in (like the image's coordinate channel) so tap
      // strides that are multiples of the seed length don't alias to a
      // constant sample
      val hi = (seed(i % seed.length) ^ (i * 31)) & 0xff
      val lo = (seed((i * 5 + 1) % seed.length) ^ (i * 17)) & 0xff
      (((hi << 8) | lo) - 32768).toShort
    }

  private val WavSampleRate = 8000f

  /** Encode PCM16 mono samples as a genuine RIFF/WAVE stream via the
    * JDK's own audio file writer.
    */
  private[graft] def encodeWav(samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      WavSampleRate, 16, 1, true, false) // PCM signed, little-endian
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(data), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic synthetic media attached to each document (the
    * test corpus ships no binaries): png and jpeg rows carry REAL
    * encoded image streams of the seed-derived pixel pattern, wav rows
    * a REAL RIFF/PCM stream of the seed-derived waveform; the
    * remaining codec-less format (mp4) carries raw seed repetitions.
    * Stands in for a `binary` + struct column pair read from
    * parquet/lance.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).cast("binary").as("seed"))
      .as[(Long, Array[Byte])]
      .map { case (id, seed) =>
        val format = Formats((id % 4).toInt)
        val side = 16 << (id % 3).toInt
        val meta = MediaMeta(format, side, side, 1 + (id % 5).toInt)
        val payload = format match {
          case "png" | "jpeg" =>
            encodeImage(synthesizeImage(seed, side, side), format)
          case "wav" =>
            // sample count plays the pixel-count role: width*height
            encodeWav(synthesizeWaveform(seed, side * side))
          case _ =>
            val reps = 1 + (id % 8).toInt
            Array.fill(reps)(seed).flatten
        }
        MediaRow(id, payload, meta)
      }
  }

  /** REAL decode for image payloads (png lossless, jpeg lossy):
    * `ImageIO.read` the compressed stream, then per sampled frame (a
    * horizontal band) extract 8 luminance taps from the decoded
    * pixels. Features depend on the actual pixel data — a corrupted
    * stream the codec rejects fails with a descriptive error instead
    * of producing plausible frames.
    */
  private[graft] def decodeImage(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null,
      s"graft-mm: payload is not a decodable ${meta.format} stream (meta ${meta.width}x${meta.height})")
    Array.tabulate(meta.n_frames) { f =>
      val y = f * img.getHeight / meta.n_frames
      Array.tabulate(8) { i =>
        val x = i * img.getWidth / 8
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        (lum - 128).toFloat / 128f
      }
    }
  }

  /** REAL decode for wav payloads: `AudioSystem.getAudioInputStream`
    * parses the RIFF container and hands back the PCM16 stream; per
    * sampled frame (a band of the sample sequence) extract 8
    * amplitude taps from the decoded samples, normalized to [-1, 1).
    * A stream the parser rejects (corrupt RIFF header) fails with a
    * descriptive error instead of producing plausible frames.
    */
  private[graft] def decodeWav(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"graft-mm: payload is not a decodable wav stream (meta ${meta.width}x${meta.height})", e)
      }
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"graft-mm: unexpected wav format $fmt")
    val bytes = in.readAllBytes()
    val n = bytes.length / 2
    require(n > 0, "graft-mm: empty wav stream")
    val samples = Array.tabulate(n) { i =>
      (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
    }
    Array.tabulate(meta.n_frames) { f =>
      val start = f * n / meta.n_frames
      val band = math.max(n / meta.n_frames, 1)
      Array.tabulate(8) { i =>
        samples(math.min(start + i * band / 8, n - 1)) / 32768f
      }
    }
  }

  /** STUB for the one format without a pure-JVM codec in this
    * container (mp4): derives an 8-float feature per frame from the
    * payload bytes so the downstream plumbing is fully exercised and
    * reproducible. A real implementation decodes per `meta.format`
    * and emits `meta.n_frames` sampled frames of `width*height`
    * pixels.
    */
  private[graft] def decodeStub(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] =
    Array.tabulate(meta.n_frames) { f =>
      Array.tabulate(8) { i =>
        val b = payload((f * 8 + i) % payload.length) & 0xff
        (b - 128).toFloat / 128f
      }
    }

  private[graft] def decodeFrames(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] =
    meta.format match {
      case "png" | "jpeg" => decodeImage(payload, meta)
      case "wav"          => decodeWav(payload, meta)
      case _              => decodeStub(payload, meta)
    }

  private[graft] def frameChecksum(feat: Array[Float]): Long =
    feat.foldLeft(1469598103934665603L) { (acc, f) =>
      (acc ^ java.lang.Float.floatToIntBits(f)) * 1099511628211L
    }

  /** Frame features, partition-batched: the mapPartitions boundary is
    * where a real decoder amortizes codec init per partition (exactly
    * what mapInPandas gives Python UDFs).
    */
  def features(spark: SparkSession, dir: String): Dataset[FrameFeature] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      // per-partition codec init goes here (ImageIO readers are
      // created per call; heavier codecs would be cached in this scope)
      rows.flatMap { r =>
        decodeFrames(r.payload, r.meta).zipWithIndex.map { case (feat, idx) =>
          FrameFeature(r.doc_id, idx, feat.length, frameChecksum(feat))
        }
      }
    }
  }

  /** Driver-visible pipeline result (rows-only check — the mp4
    * decode arm is stubbed, so no SQL oracle is claimed; the real
    * png/jpeg/wav arms are pinned by roundtrip + known-checksum
    * specs): one row per sampled frame.
    */
  def mmPipeline(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir).toDF()
      .orderBy("doc_id", "frame_idx")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_pipeline" -> (mmPipeline _))
}
