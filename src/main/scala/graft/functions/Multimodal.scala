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
  def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      sum += (i + 1).toLong * (bytes(i) & 0xff)
      i += 1
    }
    MediaFeatures(r.media_id, bytes.length.toLong,
      if (bytes.nonEmpty) (bytes(0) & 0xff).toLong else -1L,
      sum % 1000000007L)
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
