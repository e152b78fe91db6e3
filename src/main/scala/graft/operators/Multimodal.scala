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
  * decoded 16-bit samples. `mp4` payloads are genuine ISO-BMFF
  * containers (ftyp/moov/stbl/stsz/mdat) DEMUXED by a real box-tree
  * parser — the one remaining fake is the codec step inside the mp4
  * arm (no H.264 in a pure JVM): frame features tap the demuxed
  * sample bytes a real decoder would consume; swapping that tap for
  * an FFmpeg call changes no plumbing.
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

  /** Deterministic per-frame codec samples for the mp4 container —
    * variable-length (64 + 16f bytes) so the stsz sample table is
    * genuinely exercised, every byte seed-dependent.
    */
  private[graft] def synthesizeSamples(seed: Array[Byte], nFrames: Int): Array[Array[Byte]] =
    Array.tabulate(nFrames) { f =>
      val len = 64 + 16 * f
      Array.tabulate(len)(i =>
        ((seed((i * 13 + f * 7) % seed.length) ^ (i * 29)) & 0xff).toByte)
    }

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
    * a REAL RIFF/PCM stream of the seed-derived waveform, mp4 rows a
    * REAL ISO-BMFF container of seed-derived samples. Stands in for a
    * `binary` + struct column pair read from parquet/lance.
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
          case _ => // mp4: a real ISO-BMFF container of synthetic samples
            encodeMp4(synthesizeSamples(seed, meta.n_frames))
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

  /** STUB decode: derives an 8-float feature per frame straight from
    * payload bytes. Kept as the contrast baseline the codec specs
    * compare against (a decode that ignores media structure must
    * produce DIFFERENT features than the real paths).
    */
  private[graft] def decodeStub(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] =
    Array.tabulate(meta.n_frames) { f =>
      Array.tabulate(8) { i =>
        val b = payload((f * 8 + i) % payload.length) & 0xff
        (b - 128).toFloat / 128f
      }
    }

  // ----------------------------------------------------------- ISO-BMFF

  private def beInt(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array()

  /** One ISO-BMFF box: 32-bit big-endian size (header included) + 4cc
    * type + payload.
    */
  private def bmffBox(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val content = payload.flatten.toArray
    beInt(8 + content.length) ++ typ.getBytes("US-ASCII") ++ content
  }

  /** Minimal but structurally REAL MP4 container: `ftyp` (isom brand),
    * `moov > trak > mdia > minf > stbl > stsz` carrying the per-sample
    * size table, `mdat` carrying the concatenated sample payloads —
    * the boxes any demuxer needs to slice samples back out.
    */
  private[graft] def encodeMp4(samples: Array[Array[Byte]]): Array[Byte] = {
    val ftyp = bmffBox("ftyp", "isom".getBytes("US-ASCII"), beInt(0), "isom".getBytes("US-ASCII"))
    val stsz = bmffBox("stsz",
      beInt(0), // version + flags
      beInt(0), // sample_size = 0 → per-sample table follows
      beInt(samples.length),
      samples.flatMap(s => beInt(s.length)))
    val moov = bmffBox("moov",
      bmffBox("mvhd", beInt(0), beInt(1000)), // version/flags + timescale
      bmffBox("trak", bmffBox("mdia", bmffBox("minf", bmffBox("stbl", stsz)))))
    val mdat = bmffBox("mdat", samples.flatten.toArray)
    ftyp ++ moov ++ mdat
  }

  /** Parse one level of boxes in [start, end) → (type, contentStart,
    * contentEnd). Size/type violations fail loudly — a corrupt stream
    * must never silently demux.
    */
  private def bmffChildren(buf: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var off = start
    while (off < end) {
      require(off + 8 <= end, s"graft-mm: truncated ISO-BMFF box header at $off")
      val size = java.nio.ByteBuffer.wrap(buf, off, 4).getInt
      require(size >= 8 && off + size <= end,
        s"graft-mm: bad ISO-BMFF box size $size at $off (container end $end)")
      val typ = new String(buf, off + 4, 4, "US-ASCII")
      out += ((typ, off + 8, off + size))
      off += size
    }
    out.result()
  }

  /** REAL demux for mp4 payloads: walk the box tree
    * (ftyp → moov/trak/mdia/minf/stbl/stsz → mdat), read the sample
    * size table, slice the mdat into per-frame sample payloads — the
    * container work an FFmpeg-backed pipeline does before the codec.
    * The CODEC step is the one honest fake left in mm_pipeline (no
    * H.264 in a pure JVM): frame features tap the demuxed sample
    * BYTES instead of decoded pixels, so they still depend on exactly
    * the bytes a real decoder would consume.
    */
  private[graft] def decodeMp4(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] = {
    val top = bmffChildren(payload, 0, payload.length)
    require(top.headOption.exists(_._1 == "ftyp"),
      s"graft-mm: payload is not an ISO-BMFF stream (no leading ftyp; meta ${meta.format})")
    def child(boxes: Seq[(String, Int, Int)], typ: String): (String, Int, Int) =
      boxes.find(_._1 == typ).getOrElse(
        throw new IllegalArgumentException(s"graft-mm: ISO-BMFF missing $typ box"))
    def descend(path: String*): (String, Int, Int) =
      path.foldLeft(("", 0, payload.length): (String, Int, Int)) { (cur, typ) =>
        child(bmffChildren(payload, cur._2, cur._3), typ)
      }
    val stsz = descend("moov", "trak", "mdia", "minf", "stbl", "stsz")
    val b = java.nio.ByteBuffer.wrap(payload, stsz._2, stsz._3 - stsz._2)
    b.getInt // version + flags
    val fixedSize = b.getInt
    val count = b.getInt
    val sizes = Array.fill(count)(if (fixedSize == 0) b.getInt else fixedSize)
    require(count == meta.n_frames,
      s"graft-mm: stsz count $count != meta.n_frames ${meta.n_frames}")
    val mdat = child(top, "mdat")
    require(sizes.sum <= mdat._3 - mdat._2,
      s"graft-mm: mdat holds ${mdat._3 - mdat._2} bytes, sample table wants ${sizes.sum}")
    var off = mdat._2
    sizes.map { len =>
      val sample = java.util.Arrays.copyOfRange(payload, off, off + len)
      off += len
      // codec stand-in: 8 byte-taps across the demuxed sample
      Array.tabulate(8) { i =>
        ((sample(i * sample.length / 8) & 0xff) - 128).toFloat / 128f
      }
    }
  }

  private[graft] def decodeFrames(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] =
    meta.format match {
      case "png" | "jpeg" => decodeImage(payload, meta)
      case "wav"          => decodeWav(payload, meta)
      case "mp4"          => decodeMp4(payload, meta)
      case other => throw new IllegalArgumentException(s"graft-mm: unknown format $other")
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

  /** Driver-visible pipeline result (rows-only check — the mp4 arm's
    * codec step is a byte-tap stand-in, so no SQL oracle is claimed;
    * the png/jpeg/wav decodes and the mp4 demux are pinned by
    * roundtrip + known-checksum specs): one row per sampled frame.
    */
  def mmPipeline(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir).toDF()
      .orderBy("doc_id", "frame_idx")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_pipeline" -> (mmPipeline _))
}
