package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north-star): media travel as
  * opaque `binary` columns + typed metadata; decode/feature-extract runs as
  * partition-batched imperative code over the binary payloads.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`fakeDecode`); everything around it —
  * the binary schema, the per-partition batching, the row shape of extracted
  * features — is the real plumbing and is oracle-verified (length + digest
  * are recomputable in SQL).
  *
  * Scale notes: payloads never hit the driver; the work is `mapPartitions`
  * over whatever partitioning the source has (no shuffle); a real decoder
  * drops in by replacing `fakeDecode` only. In PySpark the same seam is
  * `mapInPandas` with an arrow-batched iterator — this is the Scala twin.
  */
object Multimodal {

  /** Extracted per-blob features. `width`/`height` are what a real decoder
    * would produce; the stub derives them deterministically from the digest.
    */
  case class BlobFeatures(doc_id: Long, n_bytes: Long, digest16: String,
                          width: Int, height: Int)

  /** STUB decoder: stands in for image decode (no codecs in this
    * environment). Deterministic: digest-derived pseudo-dimensions.
    */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    (64 + (md(4) & 0x7f), 64 + (md(5) & 0x7f))
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  /** Binary-column feature extraction: (doc_id, payload: binary) →
    * BlobFeatures, batched per partition (one MessageDigest per batch,
    * iterator-to-iterator, no materialization).
    */
  def extractFeatures(blobs: DataFrame): Dataset[BlobFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          md5.reset()
          val digest = md5.digest(bytes)
          val (w, h) = fakeDecode(bytes)
          BlobFeatures(id, bytes.length.toLong, hex(digest).take(16), w, h)
        }
      }
  }

  /** Documents-as-blobs view: text bytes stand in for media payloads. */
  def documentBlobs(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** One sampled "frame" of a video-like blob. `frame_off` is the byte
    * offset a real demuxer would seek to; the digest stands in for the
    * decoded frame tensor.
    */
  case class FrameRow(doc_id: Long, frame_idx: Int, frame_off: Long,
                      frame_digest: String)

  /** Frame sampling over binary payloads: one blob row → `nFrames` frame
    * rows (the media analogue of tokenize-explode; a generator, not an agg).
    * Same stubbed-decode contract as [[extractFeatures]]: the seek/decode is
    * a deterministic digest stand-in, the row fan-out, batching, and schema
    * are the real plumbing. Iterator-to-iterator, no shuffle, payloads never
    * hit the driver.
    */
  def sampleFrames(blobs: DataFrame, nFrames: Int): Dataset[FrameRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          (0 until nFrames).iterator.map { i =>
            md5.reset()
            val digest = md5.digest(bytes ++ s"#$i".getBytes("UTF-8"))
            FrameRow(id, i, i.toLong * (bytes.length / nFrames),
              hex(digest).take(16))
          }
        }
      }
  }
}
