package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by partition-batched decoders.
  *
  * Decode boundary (round 8): IMAGE and AUDIO decode are REAL —
  * [[decodeImage]] reads PNG/JPEG/BMP/GIF pixels through `javax.imageio`
  * and [[decodeAudio]] reads WAV/AIFF/AU PCM samples through
  * `javax.sound.sampled` (both reader families ship in every JDK; zero
  * external dependencies), each oracle-gated on a synthetic closed-form
  * corpus (q119 images, q120 audio — the SQL recomputes what the codec
  * must return). Only VIDEO frame extraction (and lossy-audio codecs)
  * remains a deterministic byte-level stand-in ([[frameSample]] — those
  * codecs are genuinely absent from the JDK): its Spark-side contract
  * (schema, binary transport, one-row-many-out flatMap batching) is real
  * and oracle-gated (q85), and a [[Multimodal.FrameDecoder]] ServiceLoader
  * seam (round 9) routes formats claimed by a codec jar on the classpath
  * through the real decoder with zero graft changes — unmatched formats
  * keep the stand-in, so the oracle stays pinned. Lossy AUDIO needs no
  * graft seam at all: [[decodeAudio]] reads through
  * `AudioSystem.getAudioInputStream`, which is itself a ServiceLoader
  * SPI (`javax.sound.sampled.spi.AudioFileReader`) — dropping a codec
  * jar (e.g. an MP3 reader) on the classpath extends decode to that
  * format with zero code changes; only video needed a custom trait
  * because the JDK has no audio/video framework to hang an SPI on.
  * [[decodeStub]] is kept as the codec-free byte-stats twin the q38
  * oracle pins.
  *
  * Scale notes: media blobs ride in parquet binary columns; partition sizing
  * must account for blob width (`spark.sql.files.maxPartitionBytes` smaller
  * than for scalar tables), and feature extraction is a narrow
  * mapPartitions — no shuffle, linear scan, embarrassingly parallel across
  * executors.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, payload: Array[Byte],
                            format: String, width: Int, height: Int)

  /** Extracted features (deterministic fake of a real decode). */
  final case class MediaFeatures(media_id: Long, n_bytes: Long,
                                 first_byte: Long, checksum: Long)

  /** The stub "decoder": byte length, first byte, positional checksum —
    * deterministic, byte-level, cross-engine reproducible. A real decoder
    * would return pixels/frames/spectrograms here. */
  /** Positional checksum over a byte range: Σ (i−from+1)·byte_i mod P —
    * the ONE copy of the oracle-coupled math (q38 whole-payload, q85
    * per-frame). */
  private[functions] def positionalChecksum(bytes: Array[Byte], from: Int, until: Int): Long = {
    var sum = 0L
    var i = from
    while (i < until) { sum += (i - from + 1).toLong * (bytes(i) & 0xff); i += 1 }
    sum % 1000000007L
  }

  def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    MediaFeatures(r.media_id, bytes.length.toLong,
      if (bytes.nonEmpty) (bytes(0) & 0xff).toLong else -1L,
      positionalChecksum(bytes, 0, bytes.length))
  }

  /** Batched feature extraction: one decoder invocation per partition
    * iterator (the Scala analog of a batched pandas UDF — amortizes any
    * per-batch decoder init across the partition). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (model load, JNI handle…)
      it.map(decodeStub)
    }
  }

  /** Decoded-image features: dimensions + exact per-channel pixel sums.
    * Long sums (not double means) so the oracle compare is exact integer
    * arithmetic. */
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image decode via JDK ImageIO — PNG/JPEG/BMP/GIF, no external
    * codec. Returns None when the payload is not a decodable image (the
    * pipeline filters rather than crashes on a corrupt blob — at 100 TB
    * some fraction of any scraped corpus is undecodable by construction).
    * Pixel channels come from `getRGB`'s sRGB packing; for 8-bit-per-
    * channel sources (all fixtures here) that is the exact stored value. */
  def decodeImage(payload: Array[Byte]): Option[ImageFeaturesRaw] = try {
    // explicit memory-backed stream: ImageIO.createImageInputStream's
    // default spools each stream through a temp FILE (per-row disk I/O
    // on the executor hot path) unless a process-global flag is flipped
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(in)
          val img = reader.read(0)
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          Some(ImageFeaturesRaw(w, h, sr, sg, sb))
        } finally reader.dispose()
      }
    } finally in.close()
  } catch {
    // a TRUNCATED or corrupt image whose magic bytes still matched a
    // reader must filter, not kill the task (the no-reader case already
    // returns None above). NonFatal, not just IOException: the JDK
    // readers throw unchecked exceptions (ArrayIndexOutOfBounds,
    // IllegalArgument, NegativeArraySize) on fuzzed header fields.
    case scala.util.control.NonFatal(_) => None
  }

  /** Decode result before the id is attached. */
  final case class ImageFeaturesRaw(width: Int, height: Int,
                                    sum_r: Long, sum_g: Long, sum_b: Long)

  /** Batched image feature extraction: narrow mapPartitions (no shuffle),
    * undecodable payloads dropped. The per-partition closure is where a
    * heavier decoder would hold its init (warmed codec tables, GPU
    * handle); ImageIO readers are instantiated per image by design —
    * they are stateful and not thread-safe across rows. */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeImage(r.payload).map(f =>
        ImageFeatures(r.media_id, f.width, f.height, f.sum_r, f.sum_g, f.sum_b))
    })
  }

  /** Deterministic synthetic PNG: w = 8 + id%5, h = 8 + id%3, pixel
    * (x, y) channel c ∈ {r=0, g=1, b=2} = (id·31 + 7x + 13y + 29c) mod
    * 256. PNG is LOSSLESS, so decoding must return exactly these values —
    * and the closed form means a SQL oracle can recompute the decoded
    * channel sums without any image library (q119): the gate proves the
    * real codec round-trip, not a byte checksum. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (8 + id % 5).toInt; val h = (8 + id % 3).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = id * 31 + 7 * x + 13 * y
        val r = (base % 256).toInt; val g = ((base + 29) % 256).toInt
        val b = ((base + 58) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // memory-backed output stream: the OutputStream overload of
    // ImageIO.write spools through a temp FILE by default — per-row
    // disk I/O on the executors (the write-side twin of decodeImage's
    // input-stream choice)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { javax.imageio.ImageIO.write(img, "png", ios); ios.flush() }
    finally ios.close()
    bos.toByteArray
  }

  /** Synthetic PNG corpus keyed by an id column — distributed generation
    * (the encode runs on executors), real binary payloads. */
  def syntheticImages(ids: Dataset[java.lang.Long]): Dataset[MediaRow] = {
    import ids.sparkSession.implicits._
    ids.map { id =>
      MediaRow(id, syntheticPng(id), "image/png",
        (8 + id % 5).toInt, (8 + id % 3).toInt)
    }
  }

  /** Decoded-audio features: stream shape + exact sample stats (sums of
    * ABSOLUTE sample values stay in long range for any realistic clip). */
  final case class AudioFeatures(media_id: Long, n_samples: Long, channels: Int,
                                 sample_rate: Double, sum_abs: Long, max_abs: Long)

  /** Decode result before the id is attached. */
  final case class AudioFeaturesRaw(n_samples: Long, channels: Int,
                                    sample_rate: Double, sum_abs: Long, max_abs: Long)

  /** REAL audio decode via `javax.sound.sampled` — WAV/AIFF/AU PCM, the
    * formats every JDK ships a reader for (lossy codecs need external
    * SPIs and stay out of scope with video). Returns None for payloads
    * that are not decodable LINEAR PCM: signed 16-bit, signed 8-bit, or
    * unsigned 8-bit (the WAV-spec 8-bit form, rebased to signed), any
    * channel count, either endianness — companded ULAW/ALAW streams
    * filter rather than being summed as if linear. Sample stats run over
    * ALL channels interleaved, which is what a corpus-quality filter
    * wants. */
  def decodeAudio(payload: Array[Byte]): Option[AudioFeaturesRaw] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val enc = fmt.getEncoding
        // ENCODING gate, not just sample width: 8-bit WAV is PCM_UNSIGNED
        // by spec (midpoint 0x80 — sign-extending it would report silence
        // as sum_abs = 128·n), and ULAW/ALAW also report 8 sample bits
        // but carry companded values that must not be summed as linear
        // PCM. Anything outside signed 16-bit / signed-or-unsigned 8-bit
        // linear PCM filters to None rather than returning wrong stats.
        val ok =
          (enc == AudioFormat.Encoding.PCM_SIGNED && (bits == 16 || bits == 8)) ||
            (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
        if (!ok) return None
        val unsigned8 = enc == AudioFormat.Encoding.PCM_UNSIGNED
        val bytes = in.readAllBytes()
        val step = bits / 8
        val n = bytes.length / step
        var sum = 0L; var mx = 0L
        var i = 0
        while (i < n) {
          val v: Long =
            if (bits == 8) {
              if (unsigned8) (bytes(i) & 0xff).toLong - 128L else bytes(i).toLong
            } else if (fmt.isBigEndian)
              ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)).toShort.toLong
            else ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toLong
          val a = math.abs(v)
          sum += a; if (a > mx) mx = a
          i += 1
        }
        // n_samples = frames (total samples / channels); the stats above
        // still cover every channel's samples
        Some(AudioFeaturesRaw(n.toLong / fmt.getChannels,
          fmt.getChannels, fmt.getSampleRate.toDouble, sum, mx))
      } finally in.close()
    } catch {
      // same contract as decodeImage: undecodable or corrupt audio —
      // including unchecked exceptions from fuzzed headers — filters
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Batched audio feature extraction — narrow mapPartitions, undecodable
    * payloads dropped (same shape as [[imageFeatures]]). */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeAudio(r.payload).map(f => AudioFeatures(r.media_id, f.n_samples,
        f.channels, f.sample_rate, f.sum_abs, f.max_abs))
    })
  }

  /** Deterministic synthetic WAV: mono 16-bit signed little-endian PCM at
    * 8 kHz; n = 500 + id%250 samples, sample i = ((id·7 + i·13) mod 4001)
    * − 2000. PCM in a WAV container is LOSSLESS, so decode must return
    * exactly these values — and the closed form lets a SQL oracle
    * recompute the decoded stats with no audio library (q120), proving
    * the real codec round-trip like q119 does for images. */
  def syntheticWav(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (500 + id % 250).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((id * 7 + i * 13) % 4001) - 2000).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthetic WAV corpus keyed by an id column — distributed generation,
    * real binary payloads ([[syntheticImages]]' audio sibling). */
  def syntheticAudio(ids: Dataset[java.lang.Long]): Dataset[MediaRow] = {
    import ids.sparkSession.implicits._
    ids.map(id => MediaRow(id, syntheticWav(id), "audio/wav", 0, 0))
  }

  /** One sampled frame: media id, frame position, payload stats. */
  final case class Frame(media_id: Long, frame_idx: Long, n_bytes: Long,
                         checksum: Long)

  /** SPI seam for REAL video-frame decoders (the optional-codec hook for
    * the one remaining stand-in — the JDK ships no video codecs, so graft
    * cannot decode frames itself). A deployment drops a codec jar on the
    * classpath with a `META-INF/services/graft.functions.FrameDecoder`
    * entry and [[Multimodal.frameSample]] routes matching formats through
    * it — no graft change, no recompile; unmatched formats keep the
    * deterministic byte-chunk stand-in (so the q85 oracle stays pinned).
    * Implementations must be Serializable (discovery is per-JVM, but task
    * closures may capture a decoder). */
  trait FrameDecoder extends Serializable {
    /** Media formats this decoder handles (exact match on `MediaRow.format`,
      * e.g. "video/mp4"). */
    def formats: Set[String]
    /** Decoded frames for one payload as (frame_idx, frame bytes), already
      * sampled to every `stride`-th decodable frame. The codec defines the
      * framing — `frameBytes` does not apply on this path. */
    def frames(payload: Array[Byte], stride: Int): Iterator[(Long, Array[Byte])]
  }

  object FrameDecoder {
    /** format → decoder, discovered once per JVM via ServiceLoader (first
      * provider claiming a format wins; executor JVMs re-discover from
      * their own classpath — the TCCL carries Spark's user-jar loader
      * there, with this class's loader as the local-mode fallback). */
    lazy val registry: Map[String, FrameDecoder] = {
      val loader = Option(Thread.currentThread.getContextClassLoader)
        .getOrElse(classOf[FrameDecoder].getClassLoader)
      val it = java.util.ServiceLoader.load(classOf[FrameDecoder], loader).iterator()
      val out = scala.collection.mutable.Map.empty[String, FrameDecoder]
      while (it.hasNext) {
        val d = it.next()
        d.formats.foreach(f => if (!out.contains(f)) out(f) = d)
      }
      out.toMap
    }
  }

  /** Frame sampling — the one-row-in-many-out (UDTF/flatMap) shape of a
    * real video sampler. Formats claimed by a [[FrameDecoder]] SPI
    * provider on the classpath decode through it (real codec framing);
    * for everything else the payload is treated as fixed-width frames
    * (`frameBytes` each; tail frame short) and every `stride`-th frame is
    * emitted with its positional checksum — the deterministic byte-level
    * stand-in the q85 oracle pins. Either way the Spark-side contract is
    * identical: narrow flatMap, no shuffle, output rows ≈
    * rows·frames/stride. */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int,
                  stride: Int): Dataset[Frame] = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      FrameDecoder.registry.get(r.format) match {
        case Some(dec) =>
          dec.frames(r.payload, stride).map { case (idx, bytes) =>
            Frame(r.media_id, idx, bytes.length.toLong,
              positionalChecksum(bytes, 0, bytes.length))
          }
        case None =>
          val n = r.payload.length
          val nFrames = (n + frameBytes - 1) / frameBytes
          Iterator.range(0, nFrames, stride).map { f =>
            val from = f * frameBytes
            val until = math.min(from + frameBytes, n)
            Frame(r.media_id, f.toLong, (until - from).toLong,
              positionalChecksum(r.payload, from, until))
          }
      }
    }
  }

  /** Resize — binary→binary per-row transform with updated metadata.
    * Deterministic fake: strided byte downsample to exactly w·h bytes
    * (position i samples payload(i·n/target); empty payloads stay empty).
    * A real resizer decodes + rescales pixels here; the contract is the
    * narrow map, the payload width change, and the metadata rewrite. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    // w·h must fit an Int (and a JVM array): 46341² overflows to negative
    // (executor crash), 65536² wraps to exactly 0 (silent empty payloads)
    require(w.toLong * h <= Int.MaxValue,
      s"target $w×$h overflows the payload array size")
    import media.sparkSession.implicits._
    media.map { r =>
      val n = r.payload.length
      val target = w * h
      val out =
        if (n == 0) Array.emptyByteArray
        else {
          val a = new Array[Byte](target)
          var i = 0
          while (i < target) { a(i) = r.payload((i.toLong * n / target).toInt); i += 1 }
          a
        }
      r.copy(payload = out, width = w, height = h)
    }
  }

  /** Build a media table from the documents fixture: text bytes stand in
    * for media payloads (real binary column, fake modality). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("fake/text").as("format"),
        lit(0).as("width"), lit(0).as("height"))
      .as[MediaRow]
  }
}
