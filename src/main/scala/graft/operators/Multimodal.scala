package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs partition-wise over the binary payloads so a real
  * codec drops in without touching the dataflow.
  *
  * The decode step itself is a STUB — this container has no image or
  * audio libraries — replaced by a deterministic transform of the raw
  * bytes (documented below), so the Spark-side contract (schema,
  * partitioning, per-partition batch shape, feature vector type) is
  * real and tested while the codec is swappable.
  *
  * Scale: payloads stay columnar-binary end to end; feature extraction
  * is `mapPartitions` (one iterator per task — the Scala analog of a
  * pandas-batched UDF), so codec state (decoder contexts, model
  * weights) initializes once per partition, not per row.
  */
object Multimodal {

  /** A media asset row: binary payload + typed metadata. */
  case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  /** Extracted features: payload stats + a fixed-dim float vector. */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      features: Array[Float])

  /** Deterministic synthetic media: payload = md5(media_id) bytes —
    * reproducible on any engine (the oracle rebuilds it from
    * DuckDB's md5). Even ids are "image", odd are "audio". */
  def syntheticMedia(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(
      col(idCol).cast("long").as("media_id"),
      when(col(idCol) % 2 === 0, "image").otherwise("audio").as("kind"),
      unhex(md5(col(idCol).cast("string"))).as("payload"),
      lit(64).as("width"), lit(64).as("height"))
      .as[MediaRow]
  }

  /** Partition-wise decode + feature extraction.
    *
    * STUB DECODE: a real implementation would parse the payload with an
    * image/audio codec here (initialized once per partition, before the
    * iterator is consumed). The stand-in derives features directly from
    * payload bytes: feature(i) = byte(i*stride mod len)/255, checksum =
    * sum of unsigned byte values — deterministic and byte-exact so the
    * plumbing is oracle-checkable.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init point: real codecs/models would load here
      val stride = 2
      it.map { m =>
        val bytes = m.payload
        val checksum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        val feats = Array.tabulate(dim) { i =>
          (bytes((i * stride) % bytes.length) & 0xff) / 255.0f
        }
        MediaFeatures(m.media_id, m.kind, bytes.length.toLong, checksum, feats)
      }
    }
  }

  /** Resize: downsample the payload by an integer factor (every
    * factor-th byte) and update the typed metadata accordingly.
    *
    * STUB RESIZE: a real implementation decodes, scales with an image
    * library, and re-encodes here; the stand-in keeps the contract —
    * payload shrinks deterministically, width/height metadata track the
    * factor — so downstream schema/partitioning is exercised for real. */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val out = m.payload.zipWithIndex.collect {
        case (b, i) if i % factor == 0 => b
      }
      m.copy(payload = out, width = m.width / factor, height = m.height / factor)
    }
  }

  /** Frame sampling: split a payload into fixed-size "frames" and keep
    * every nth — the video-frame-sampling shape on opaque bytes. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, everyNth: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyNth == 0)
        .map { case (frame, idx) => (m.media_id, idx.toLong, frame) }
    }.toDF("media_id", "frame_idx", "frame")
  }
}
