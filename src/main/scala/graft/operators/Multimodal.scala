package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media bytes ride as opaque `binary` columns with typed metadata
  * alongside; decode + feature extraction run partition-parallel inside
  * `mapPartitions` (codec init amortized per partition, no driver
  * involvement), and media bytes never shuffle — only the small feature
  * rows flow onward.
  *
  * The codec is REAL for the library-free container formats — BMP
  * (BITMAPINFOHEADER width/height) and RIFF/WAV (sample rate, channels)
  * are parsed straight off the header bytes; formats that genuinely need
  * a decoding library (JPEG, MP4, ...) report (0, 0) "metadata
  * unavailable", exactly how a production pipeline quarantines
  * undecodable media. Swapping in a full decoder changes one function
  * with identical distribution behavior.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int)

  /** Header-level media decode, no external libraries.
    * Returns (width, height) for BMP, (sampleRate, channels) for WAV,
    * (0, 0) for anything unrecognized. */
  object MediaCodec {
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    def decode(payload: Array[Byte]): (Int, Int) = {
      if (payload.length >= 26 && payload(0) == 'B' && payload(1) == 'M')
        (le32(payload, 18), math.abs(le32(payload, 22)))
      else if (payload.length >= 28 && payload(0) == 'R' && payload(1) == 'I' &&
               payload(2) == 'F' && payload(3) == 'F' &&
               payload(8) == 'W' && payload(9) == 'A' &&
               payload(10) == 'V' && payload(11) == 'E')
        (le32(payload, 24), le16(payload, 22))
      else (0, 0)
    }

    /** Minimal valid BMP: 54-byte BITMAPFILEHEADER+BITMAPINFOHEADER
      * (pixel data omitted — the header is all metadata extraction
      * reads). */
    def bmpBytes(width: Int, height: Int): Array[Byte] = {
      val b = new Array[Byte](54)
      b(0) = 'B'; b(1) = 'M'
      putLe32(b, 2, 54); putLe32(b, 10, 54); putLe32(b, 14, 40)
      putLe32(b, 18, width); putLe32(b, 22, height)
      b(26) = 1; b(28) = 24
      b
    }

    /** Minimal RIFF/WAVE header (44 bytes, empty data chunk). */
    def wavBytes(sampleRate: Int, channels: Int): Array[Byte] = {
      val b = new Array[Byte](44)
      b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
      putLe32(b, 4, 36)
      b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
      b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
      putLe32(b, 16, 16); b(20) = 1
      b(22) = (channels & 0xff).toByte; b(23) = ((channels >> 8) & 0xff).toByte
      putLe32(b, 24, sampleRate)
      putLe32(b, 28, sampleRate * channels * 2); b(32) = (channels * 2).toByte
      b(34) = 16
      b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
      b
    }

    private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
  }

  /** Attach a deterministic synthetic binary payload to any table — the
    * stand-in for reading real media files ([[fromBinaryFiles]] in
    * production): images are real (truncated) BMPs, audio real WAV
    * headers, video an opaque blob the codec reports as undecodable. */
  def syntheticMedia(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      (id % 3) match {
        case 0 => MediaRow(id, "image",
          MediaCodec.bmpBytes((16 + id % 256).toInt, (16 + (id * 7) % 256).toInt))
        case 1 => MediaRow(id, "audio",
          MediaCodec.wavBytes((8000 + (id % 8) * 1000).toInt, (1 + id % 2).toInt))
        case _ => MediaRow(id, "video",
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8")) ++
            java.security.MessageDigest.getInstance("MD5")
              .digest((id + 1).toString.getBytes("UTF-8")))
      }
    }
  }

  /** Real file ingestion: Spark's `binaryFile` source → MediaRow. Kind is
    * taken from the file extension; ids from a stable hash of the path. */
  def fromBinaryFiles(spark: SparkSession, path: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(xxhash64(col("path")).as("media_id"),
        lower(element_at(split(col("path"), "\\."), -1)).as("ext"),
        col("content").as("payload"))
      .withColumn("kind",
        when(col("ext").isin("bmp", "png", "jpg", "jpeg"), "image")
          .when(col("ext").isin("wav", "mp3", "flac"), "audio")
          .when(col("ext").isin("mp4", "mkv", "webm"), "video")
          .otherwise("other"))
      .select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
  }

  /** Partition-parallel decode + feature extraction. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would happen here
      rows.map { r =>
        val (w, h) = MediaCodec.decode(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, w, h)
      }
    }
  }
}
