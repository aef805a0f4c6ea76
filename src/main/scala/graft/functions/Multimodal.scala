package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by partition-batched decoders.
  *
  * The decode step is STUBBED (no media libs in this container) with a
  * deterministic fake that reads real bytes — the Spark-side contract
  * (schema, binary transport, mapPartitions batching, feature output shape)
  * is real and tested. Swap `decodeStub` for a JNI/FFI decoder (or column
  * batches via Arrow) without touching the pipeline.
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

  /** One sampled frame: media id, frame position, payload stats. */
  final case class Frame(media_id: Long, frame_idx: Long, n_bytes: Long,
                         checksum: Long)

  /** Frame sampling — the one-row-in-many-out (UDTF/flatMap) shape of a
    * real video sampler. The payload is treated as fixed-width frames
    * (`frameBytes` each; tail frame short) and every `stride`-th frame is
    * emitted with its positional checksum. Deterministic byte-level fake
    * of keyframe extraction: a real sampler seeks codec keyframes here —
    * the batch shape (narrow flatMap, no shuffle, output rows ≈
    * rows·frames/stride) is the Spark-side contract. */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int,
                  stride: Int): Dataset[Frame] = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    import media.sparkSession.implicits._
    media.flatMap { r =>
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
