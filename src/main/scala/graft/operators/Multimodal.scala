package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media bytes ride as opaque `binary` columns with typed metadata
  * alongside. The Spark-side machinery — schema, batch iteration,
  * partition-parallel decode, feature extraction shape — is real; the
  * codec itself is STUBBED (`FakeCodec`) because no image/audio libraries
  * ship in this environment. Swapping in a real decoder is a one-function
  * change with identical distribution behavior.
  *
  * Scale notes: decode runs inside `mapPartitions` (one codec instance
  * per partition, amortized init, no driver involvement); media bytes
  * never shuffle — features are extracted in the same narrow stage and
  * only the (small) feature vectors flow onward.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, checksum: Long)

  /** STUB codec: deterministic pseudo-decode of a media payload.
    * A real implementation would parse the container format; this derives
    * stable fake dimensions from the bytes so the plumbing is testable. */
  object FakeCodec {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Long) = {
      var crc = 0L
      var i = 0
      while (i < payload.length) { crc = crc * 31 + (payload(i) & 0xff); i += 1 }
      val w = 16 + math.floorMod(crc, 1024).toInt
      val h = if (kind == "audio") 1 else 16 + math.floorMod(crc >> 10, 1024).toInt
      (w, h, crc)
    }
  }

  /** Attach a deterministic synthetic binary payload to any table — the
    * stand-in for reading real media files (`binaryFile` source in
    * production). */
  def syntheticMedia(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col(idCol) % 3 + 1).cast("int")).as("kind"),
        // payload: repeat of the md5 hex of the id — opaque, deterministic
        encode(repeat(md5(col(idCol).cast("string")), 4), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Partition-parallel decode + feature extraction. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would happen here
      rows.map { r =>
        val (w, h, crc) = FakeCodec.decode(r.kind, r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, w, h, crc)
      }
    }
  }
}
