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
  * The decode step is REAL for all four formats: `png` and `jpeg`
  * payloads are genuine encoded streams (the pure-JVM `javax.imageio`
  * codecs, no native libs) and `decodeImage` runs `ImageIO.read`,
  * deriving frame features from the actual decoded pixels — png
  * roundtrips pixel-exact, jpeg is honestly lossy (features come from
  * what the codec reconstructs). `wav` payloads are genuine RIFF/PCM
  * streams written and read back through `javax.sound.sampled.
  * AudioSystem` (also pure-JVM), with frame features tapped from the
  * decoded 16-bit samples. `mp4` payloads are genuine ISO-BMFF
  * containers (ftyp/moov/stbl/stsd+stsz/mdat) carrying MOTION-JPEG
  * video — JPEG-per-frame, the mp4-compatible codec family a pure JVM
  * CAN decode — DEMUXED by a real box-tree parser (stsd verifies the
  * declared codec, stsz slices the samples) and then each frame
  * DECODED with `ImageIO`: features come from decoded pixels on every
  * arm. Swapping the per-sample codec call for an FFmpeg binding
  * (H.264 and friends) changes no plumbing.
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

  /** One sampled frame: the typed metadata the demux/decode verified
    * (format, dims, sample count) plus the decoded-pixel features
    * folded to fixed-point integer checksums — the deterministic arm
    * the DuckDB oracle checks (metadata re-derived in pure SQL;
    * checksums against the committed expectation parquet, see
    * [[mmPipelineSql]]).
    */
  case class FrameFeature(doc_id: Long, frame_idx: Int, format: String,
    width: Int, height: Int, n_frames: Int, dim: Int, checksum: Long,
    thumb_checksum: Long)

  private val Formats = Array("jpeg", "png", "wav", "mp4")

  /** FNV-1a fold shared by every checksum in this pipeline (frame
    * features, image thumbnails, audio previews).
    */
  private val FnvOffset = 1469598103934665603L
  private val FnvPrime = 1099511628211L

  /** Deterministic pixel pattern seeded by the doc's md5: the image a
    * png row's payload encodes. Channel mix keeps every pixel
    * dependent on the seed bytes so a decode that ignores the payload
    * cannot reproduce the features.
    */
  private[graft] def synthesizeImage(seed: Array[Byte], w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // packed-int writes straight into the raster buffer: a fresh
    // TYPE_INT_RGB image is a SinglePixelPackedSampleModel with
    // scanline stride w and offset 0, and setRGB stores exactly the
    // 24 low bits we compute — same pixels, without setRGB's per-call
    // color-model conversion on every pixel of every frame
    val px = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    val sl = seed.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val r = seed(i % sl) & 0xff
        val g = seed((i * 7 + 3) % sl) & 0xff
        val b = (x * 31 + y * 17) & 0xff
        px(i) = (r << 16) | (g << 8) | b
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

  /** Per-frame seed: md5 of (doc seed ++ frame index) — each frame of
    * the Motion-JPEG track is a DIFFERENT seed-derived image, so the
    * stsz table carries genuinely varying JPEG sizes and a decode that
    * confuses frames cannot match the checksums.
    */
  private[graft] def frameSeed(seed: Array[Byte], f: Int): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(seed ++ Array(f.toByte))

  /** Deterministic per-frame codec samples for the mp4 container:
    * REAL JPEG streams (Motion-JPEG), one seed-derived image per
    * frame.
    */
  private[graft] def synthesizeSamples(seed: Array[Byte], nFrames: Int,
      side: Int): Array[Array[Byte]] =
    Array.tabulate(nFrames) { f =>
      encodeImage(synthesizeImage(frameSeed(seed, f), side, side), "jpeg")
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
    // fan the (doc_id, seed) rows out across the cores before the
    // synthesize/encode map — the single-row-group corpus scan
    // otherwise runs the whole codec chain in ONE task (§2.5); the
    // exchange moves 40 bytes per doc
    Tables.spread(Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).cast("binary").as("seed")), "doc_id")
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
          case _ => // mp4: a real ISO-BMFF container of Motion-JPEG frames
            encodeMp4(synthesizeSamples(seed, meta.n_frames, side), side)
        }
        MediaRow(id, payload, meta)
      }
  }

  /** 8 luminance taps across row `y` of a decoded image — THE feature
    * definition every image-decoding arm shares (png/jpeg bands and
    * the mp4 track's per-frame decode must agree on what a feature
    * is).
    */
  private def lumTaps(img: BufferedImage, y: Int): Array[Float] =
    Array.tabulate(8) { i =>
      val x = i * img.getWidth / 8
      val rgb = img.getRGB(x, y)
      val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
      (lum - 128).toFloat / 128f
    }

  /** The resize stage: a ThumbSide×ThumbSide nearest-neighbor
    * downscale of a decoded frame. Deterministic by DEFINITION —
    * output pixel (x,y) is exactly input pixel
    * (floor((x+.5)·w/T), floor((y+.5)·h/T)), the pixel whose center
    * the inverse map hits — so a spec recomputes a thumbnail
    * pixel-for-pixel from the synthesis formula without touching the
    * resizer. (Hand-rolled rather than `AffineTransformOp`: the AWT op
    * throws `ImagingOpException` on some headless JVMs, and its
    * rounding is implementation-defined where this loop is spec.)
    * Folded to a checksum per frame; audio rows decimate their
    * decoded samples with the same rule instead.
    */
  private[graft] val ThumbSide = 8

  private[graft] def thumbnail(img: BufferedImage): BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new BufferedImage(ThumbSide, ThumbSide, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ThumbSide) {
      val sy = (2 * y + 1) * h / (2 * ThumbSide)
      var x = 0
      while (x < ThumbSide) {
        out.setRGB(x, y, img.getRGB((2 * x + 1) * w / (2 * ThumbSide), sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** FNV fold of every RGB pixel of a thumbnail, row-major. */
  private[graft] def thumbChecksum(img: BufferedImage): Long = {
    var acc = FnvOffset
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        acc = (acc ^ (img.getRGB(x, y) & 0xffffff)) * FnvPrime
        x += 1
      }
      y += 1
    }
    acc
  }

  /** REAL decode for image payloads (png lossless, jpeg lossy):
    * `ImageIO.read` the compressed stream, then per sampled frame (a
    * horizontal band) extract 8 luminance taps from the decoded
    * pixels. Features depend on the actual pixel data — a corrupted
    * stream the codec rejects fails with a descriptive error instead
    * of producing plausible frames.
    */
  private[graft] def decodeImage(payload: Array[Byte], meta: MediaMeta): Array[(Array[Float], Long)] = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null,
      s"graft-mm: payload is not a decodable ${meta.format} stream (meta ${meta.width}x${meta.height})")
    // a still image frame-samples into bands but has ONE thumbnail
    val thumb = thumbChecksum(thumbnail(img))
    Array.tabulate(meta.n_frames) { f =>
      (lumTaps(img, f * img.getHeight / meta.n_frames), thumb)
    }
  }

  /** REAL decode for wav payloads: `AudioSystem.getAudioInputStream`
    * parses the RIFF container and hands back the PCM16 stream; per
    * sampled frame (a band of the sample sequence) extract 8
    * amplitude taps from the decoded samples, normalized to [-1, 1).
    * A stream the parser rejects (corrupt RIFF header) fails with a
    * descriptive error instead of producing plausible frames.
    */
  /** Audio "thumbnail": the waveform decimated to ThumbSide² samples
    * (nearest-neighbor, the same floor((i+.5)·n/N) rule as the image
    * resize), folded to a checksum — the preview a media pipeline
    * stores next to the full track.
    */
  private[graft] def waveThumbChecksum(samples: Array[Short]): Long = {
    val n = samples.length
    // decodeWav rejects empty streams before reaching here; guard the
    // direct-call path too (idx would otherwise be -1)
    require(n > 0, "graft-mm: cannot thumbnail an empty waveform")
    val taps = ThumbSide * ThumbSide
    var acc = FnvOffset
    var i = 0
    while (i < taps) {
      val idx = math.min((2 * i + 1) * n / (2 * taps), n - 1)
      acc = (acc ^ (samples(idx) & 0xffff)) * FnvPrime
      i += 1
    }
    acc
  }

  /** RIFF/PCM extraction of the wav arm in isolation — the container
    * parse plus PCM16 widening, before any feature/preview work.
    * Factored out of [[decodeWav]] for stage attribution (wav has no
    * entropy codec, so this IS its whole demux+decode).
    */
  private[graft] def pcmSamples(payload: Array[Byte], meta: MediaMeta): Array[Short] = {
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
    Array.tabulate(n) { i =>
      (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
    }
  }

  private[graft] def decodeWav(payload: Array[Byte], meta: MediaMeta): Array[(Array[Float], Long)] = {
    val samples = pcmSamples(payload, meta)
    val n = samples.length
    val thumb = waveThumbChecksum(samples)
    Array.tabulate(meta.n_frames) { f =>
      val start = f * n / meta.n_frames
      val band = math.max(n / meta.n_frames, 1)
      (Array.tabulate(8) { i =>
        samples(math.min(start + i * band / 8, n - 1)) / 32768f
      }, thumb)
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

  private def beShort(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** One ISO-BMFF box: 32-bit big-endian size (header included) + 4cc
    * type + payload.
    */
  private def bmffBox(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val content = payload.flatten.toArray
    beInt(8 + content.length) ++ typ.getBytes("US-ASCII") ++ content
  }

  /** The sample-entry 4cc the track declares: Motion-JPEG (QuickTime's
    * 'jpeg' VisualSampleEntry — each sample is a complete JPEG image).
    */
  private[graft] val Mp4Codec = "jpeg"

  /** A real VisualSampleEntry for the stsd box: 6 reserved bytes,
    * data_reference_index, the 16 pre_defined/reserved bytes, then
    * width/height, 72-dpi resolutions, frame_count 1, a zero-padded
    * compressorname, depth 24 and the trailing pre_defined −1 —
    * exactly the 78-byte layout ISO 14496-12 §12.1.3 prescribes.
    */
  private def visualSampleEntry(codec: String, w: Int, h: Int): Array[Byte] =
    bmffBox(codec,
      new Array[Byte](6), beShort(1),
      new Array[Byte](16),
      beShort(w), beShort(h),
      beInt(0x00480000), beInt(0x00480000), // 72 dpi horiz/vert
      beInt(0), beShort(1),
      new Array[Byte](32), // compressorname (pascal, zero-padded)
      beShort(24), beShort(0xffff))

  /** Minimal but structurally REAL MP4 container: `ftyp` (isom brand),
    * `moov > trak > mdia > minf > stbl` holding `stsd` (the codec
    * declaration — a Motion-JPEG VisualSampleEntry) and `stsz` (the
    * per-sample size table), `mdat` carrying the concatenated JPEG
    * frames — the boxes any demuxer needs to slice and decode samples.
    */
  private[graft] def encodeMp4(samples: Array[Array[Byte]], side: Int): Array[Byte] =
    encodeMp4Raw(samples, side, Mp4Codec)

  /** Codec-parametric variant — the corrupt-codec spec builds a track
    * declaring a sample entry this JVM cannot decode (e.g. 'avc1') to
    * pin the loud stsd failure.
    */
  private[graft] def encodeMp4Raw(samples: Array[Array[Byte]], side: Int,
      codec: String): Array[Byte] = {
    val ftyp = bmffBox("ftyp", "isom".getBytes("US-ASCII"), beInt(0), "isom".getBytes("US-ASCII"))
    val stsd = bmffBox("stsd",
      beInt(0), // version + flags
      beInt(1), // entry_count
      visualSampleEntry(codec, side, side))
    val stsz = bmffBox("stsz",
      beInt(0), // version + flags
      beInt(0), // sample_size = 0 → per-sample table follows
      beInt(samples.length),
      samples.flatMap(s => beInt(s.length)))
    val moov = bmffBox("moov",
      bmffBox("mvhd", beInt(0), beInt(1000)), // version/flags + timescale
      bmffBox("trak", bmffBox("mdia", bmffBox("minf", bmffBox("stbl", stsd, stsz)))))
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
    * (ftyp → moov/trak/mdia/minf/stbl → stsd + stsz → mdat), verify
    * the declared sample-entry codec, read the sample size table and
    * slice the mdat into per-frame samples — the container work an
    * FFmpeg-backed pipeline does before the codec. Demuxed samples
    * then go through the REAL codec: each is a complete JPEG frame
    * (Motion-JPEG) decoded with `ImageIO`, features tapped from the
    * decoded pixels like the still-image arms. A track declaring a
    * codec this JVM cannot decode (H.264 etc.) fails loudly at the
    * stsd check instead of faking frames.
    */
  private[graft] def decodeMp4(payload: Array[Byte], meta: MediaMeta): Array[(Array[Float], Long)] =
    demuxMp4(payload, meta).zipWithIndex.map { case (sample, f) =>
      // the real codec step: every sample is a complete JPEG frame —
      // and a video track gets a DISTINCT thumbnail per frame
      val img = ImageIO.read(new ByteArrayInputStream(sample))
      require(img != null,
        s"graft-mm: sample $f is not a decodable $Mp4Codec frame (${sample.length} bytes)")
      (lumTaps(img, f * img.getHeight / meta.n_frames),
        thumbChecksum(thumbnail(img)))
    }

  /** The DEMUX stage of the mp4 arm in isolation: ISO-BMFF box walk,
    * stsd codec check, stsz sample table, per-sample mdat slicing —
    * everything before the codec. Factored out of [[decodeMp4]] so
    * stage attribution (r16 verdict item 4) times the container work
    * the pipeline does before JPEG decode, using the same code the
    * shipped path runs.
    */
  private[graft] def demuxMp4(payload: Array[Byte], meta: MediaMeta): Array[Array[Byte]] = {
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
    val stbl = descend("moov", "trak", "mdia", "minf", "stbl")
    val stblBoxes = bmffChildren(payload, stbl._2, stbl._3)
    // codec declaration: first sample entry of stsd (version/flags +
    // entry_count precede it)
    val stsd = child(stblBoxes, "stsd")
    val entries = bmffChildren(payload, stsd._2 + 8, stsd._3)
    val codec = entries.headOption.map(_._1).getOrElse(
      throw new IllegalArgumentException("graft-mm: stsd declares no sample entry"))
    require(codec == Mp4Codec,
      s"graft-mm: track codec '$codec' is not decodable here (pure-JVM Motion-JPEG only)")
    val stsz = child(stblBoxes, "stsz")
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
      sample
    }
  }

  private[graft] def decodeFrames(payload: Array[Byte], meta: MediaMeta): Array[(Array[Float], Long)] =
    meta.format match {
      case "png" | "jpeg" => decodeImage(payload, meta)
      case "wav"          => decodeWav(payload, meta)
      case "mp4"          => decodeMp4(payload, meta)
      case other => throw new IllegalArgumentException(s"graft-mm: unknown format $other")
    }

  // ------- stage attribution + subsampled resize (r16 verdict item 4)

  /** DEMUX-only arm: container work with the codec skipped — the
    * ISO-BMFF walk + mdat slicing for mp4, the RIFF parse + PCM16
    * widening for wav (no entropy codec exists there), nothing for
    * the single-sample image formats. Returns sliced sample count.
    * ScaleKnobs times this vs [[decodeOnly]] vs the full pipeline so
    * "codec-bound" is a measured per-stage claim, not an inference
    * from the total.
    */
  private[graft] def demuxOnly(payload: Array[Byte], meta: MediaMeta): Int =
    meta.format match {
      case "png" | "jpeg" => 1
      case "wav"          => pcmSamples(payload, meta); 1
      case "mp4"          => demuxMp4(payload, meta).length
      case other => throw new IllegalArgumentException(s"graft-mm: unknown format $other")
    }

  /** Demux + FULL-FRAME codec decode, with features/resize/checksums
    * skipped — the middle attribution stage. Returns decoded frame
    * count.
    */
  private[graft] def decodeOnly(payload: Array[Byte], meta: MediaMeta): Int =
    meta.format match {
      case "png" | "jpeg" =>
        require(ImageIO.read(new ByteArrayInputStream(payload)) != null,
          s"graft-mm: undecodable ${meta.format} stream")
        1
      case "wav" => pcmSamples(payload, meta); 1
      case "mp4" => demuxMp4(payload, meta).map { sample =>
        require(ImageIO.read(new ByteArrayInputStream(sample)) != null,
          s"graft-mm: undecodable $Mp4Codec frame")
        1
      }.sum
      case other => throw new IllegalArgumentException(s"graft-mm: unknown format $other")
    }

  /** SUBSAMPLED decode of exactly the thumbnail's pixel grid: the
    * resize rule reads source pixel ((2x+1)·w/2T, (2y+1)·h/2T), which
    * for dims divisible by 2T is the uniform grid offset (w/2T, h/2T)
    * stride (w/T, h/T) — precisely what
    * `ImageReadParam.setSourceSubsampling` yields, so the reader
    * materializes a T×T image instead of w×h and the resize becomes
    * the identity. Every synthetic corpus side (16/32/64) is
    * divisible by 2T=16; non-conforming dims fail loudly rather than
    * silently shifting the grid (callers fall back to
    * [[thumbnail]]-over-full-decode). Pixel parity with the full
    * path is spec-pinned per format — for png it is lossless-exact by
    * construction; for jpeg it holds because the JDK reader
    * subsamples AFTER inverse-DCT, from the same decoded scanlines
    * the full read returns.
    */
  private[graft] def thumbnailSubsampled(sample: Array[Byte]): BufferedImage = {
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(sample))
    try {
      val readers = ImageIO.getImageReaders(in)
      require(readers.hasNext, "graft-mm: no JVM reader for stream")
      val reader = readers.next()
      try {
        reader.setInput(in, true, true)
        val (w, h) = (reader.getWidth(0), reader.getHeight(0))
        require(w % (2 * ThumbSide) == 0 && h % (2 * ThumbSide) == 0,
          s"graft-mm: subsampled thumbnail needs dims divisible by ${2 * ThumbSide}, got ${w}x$h")
        val p = reader.getDefaultReadParam
        p.setSourceSubsampling(w / ThumbSide, h / ThumbSide,
          w / (2 * ThumbSide), h / (2 * ThumbSide))
        val img = reader.read(0, p)
        require(img.getWidth == ThumbSide && img.getHeight == ThumbSide,
          s"graft-mm: subsampled read yielded ${img.getWidth}x${img.getHeight}, want ${ThumbSide}x$ThumbSide")
        img
      } finally reader.dispose()
    } finally in.close()
  }

  /** Thumbnail-only arm (the resize stage a preview-generation pass
    * runs without features): per-doc FNV fold of the frame thumbnail
    * checksums, image formats only. `sub = true` routes each frame
    * through [[thumbnailSubsampled]] — the A/B where "the decoder
    * never materializes full frames it immediately shrinks" can
    * actually win, because unlike the shipped feature pipeline
    * nothing here needs full-resolution rows. Both arms fold the
    * identical per-frame checksums, so an aggregate equality over the
    * corpus is a pixel-parity proof.
    */
  private[graft] def thumbOnly(payload: Array[Byte], meta: MediaMeta, sub: Boolean): Long = {
    def one(sample: Array[Byte]): Long =
      if (sub) thumbChecksum(thumbnailSubsampled(sample))
      else {
        val img = ImageIO.read(new ByteArrayInputStream(sample))
        require(img != null, "graft-mm: undecodable image stream")
        thumbChecksum(thumbnail(img))
      }
    meta.format match {
      case "png" | "jpeg" => one(payload)
      case "mp4" => demuxMp4(payload, meta)
        .foldLeft(FnvOffset)((acc, s) => (acc ^ one(s)) * FnvPrime)
      case other => throw new IllegalArgumentException(
        s"graft-mm: thumbOnly is an image-format arm, got $other")
    }
  }

  private[graft] def frameChecksum(feat: Array[Float]): Long =
    feat.foldLeft(FnvOffset) { (acc, f) =>
      (acc ^ java.lang.Float.floatToIntBits(f)) * FnvPrime
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
        decodeFrames(r.payload, r.meta).zipWithIndex.map { case ((feat, thumb), idx) =>
          FrameFeature(r.doc_id, idx, r.meta.format, r.meta.width, r.meta.height,
            r.meta.n_frames, feat.length, frameChecksum(feat), thumb)
        }
      }
    }
  }

  /** Driver-visible pipeline result: one row per sampled frame, fully
    * oracled (rows+schema+hash) since round 8. Codec output is not
    * SQL-reproducible, so the oracle splits the deterministic arm in
    * two (see [[mmPipelineSql]]): the typed METADATA columns are
    * re-derived in pure SQL from doc_id (independent), and the
    * fixed-point frame/thumbnail CHECKSUMS come from the committed
    * expectation parquet ([[MmExpectedPath]]) keyed by
    * (doc_id, md5(text), frame_idx). The expectation file is a
    * regression pin generated once by [[graft.MmExpected]];
    * independence of the decode itself rests on the roundtrip +
    * synthesis-formula specs (StreamingSpec's mm png/jpeg/wav/mp4
    * suites recompute features from the pixel formula without
    * touching the codec).
    */
  def mmPipeline(spark: SparkSession, dir: String): DataFrame =
    // the frame features materialize once before the presentation
    // sort: the sort's range-bounds sample pass otherwise re-runs the
    // whole synthesize→demux→decode→thumbnail pipeline a second time
    // (r18 plan audit — the most expensive body in the gate, paid
    // twice for partition bounds over already-computed rows)
    graft.Scratch.cpSorted(features(spark, dir).toDF(),
      col("doc_id"), col("frame_idx"))

  /** Committed expectation parquet covering the UNION of every test
    * corpus (the four sf dirs), deduplicated by
    * (doc_id, seed_hex, frame_idx) — the oracle joins it against the
    * CURRENT corpus's documents on doc_id AND md5(text), so each sf
    * dir selects exactly its own expected frames.
    */
  val MmExpectedPath = "/root/repo/testdata/mm_expected.parquet"

  def mmPipelineSql: String =
    s"""SELECT e.doc_id, e.frame_idx,
       |  CASE CAST(e.doc_id % 4 AS INT) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
       |    WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
       |  CAST(16 * (1 << CAST(e.doc_id % 3 AS INT)) AS INT) AS width,
       |  CAST(16 * (1 << CAST(e.doc_id % 3 AS INT)) AS INT) AS height,
       |  CAST(1 + e.doc_id % 5 AS INT) AS n_frames,
       |  e.dim, e.checksum, e.thumb_checksum
       |FROM read_parquet('$MmExpectedPath/*.parquet') e
       |JOIN documents d ON d.doc_id = e.doc_id AND e.seed_hex = md5(d.text)
       |ORDER BY e.doc_id, e.frame_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_pipeline" -> (mmPipeline _))

  def oracles: Map[String, String] = Map(
    "mm_pipeline" -> mmPipelineSql)
}
