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

  /** One cell of a "resized" (downsampled) image-like blob: the byte
    * payload split into `cells` contiguous ranges, each reduced to exact
    * integer (count, sum) — the thumbnail/pooling analogue. A real resize
    * replaces the range-mean with a decoder + interpolation; the fan-out,
    * batching, and exact-aggregation shape stay identical.
    */
  case class CellRow(doc_id: Long, cell: Int, n_bytes: Int, sum_bytes: Long)

  /** Downsample each blob into `cells` contiguous byte-range cells.
    * Iterator-to-iterator, no shuffle; integer-exact so the oracle can
    * recompute cells from the same payload bytes.
    */
  def resizeGrid(blobs: DataFrame, cells: Int): Dataset[CellRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val L = bytes.length
          (0 until cells).iterator.map { i =>
            val from = (i.toLong * L / cells).toInt
            val until = ((i + 1).toLong * L / cells).toInt
            var s = 0L
            var j = from
            while (j < until) { s += (bytes(j) & 0xff); j += 1 }
            CellRow(id, i, until - from, s)
          }
        }
      }
  }

  /** One fixed-size window of an audio-like blob: bytes as samples, energy
    * = Σ (b − 100)² over the window — exact integers, the RMS-energy
    * feature shape (voice-activity detection, silence trimming) with the
    * codec stubbed out.
    */
  case class EnergyRow(doc_id: Long, win_idx: Int, n_samples: Int, energy: Long)

  /** Windowed energy over binary payloads (window = `win` bytes, last
    * window ragged). Same contract as [[sampleFrames]]: generator fan-out,
    * partition-batched, payloads never leave the executor.
    */
  def audioEnergy(blobs: DataFrame, win: Int): Dataset[EnergyRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val L = bytes.length
          val n = (L + win - 1) / win
          (0 until n).iterator.map { w =>
            val from = w * win
            val until = math.min(from + win, L)
            var e = 0L
            var j = from
            while (j < until) {
              val v = (bytes(j) & 0xff) - 100L
              e += v * v
              j += 1
            }
            EnergyRow(id, w, until - from, e)
          }
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
