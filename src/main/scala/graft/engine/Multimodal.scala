package graft.engine

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media item: an opaque binary payload plus typed metadata. The engine
  * treats image/audio/video as `binary` columns — decode happens at the edge
  * of the plan, never in the storage/shuffle layer. */
final case class MediaItem(
    media_id: Long, kind: String, payload: Array[Byte],
    width: Int, height: Int, sample_rate: Int, duration_ms: Long)

/** Fixed-shape feature row produced by the (stubbed) decoder. */
final case class MediaFeatures(
    media_id: Long, kind: String, n_bytes: Int, feature: Array[Float])

/** Per-frame feature row from video frame sampling. */
final case class FrameFeatures(
    media_id: Long, frame_idx: Int, feature: Array[Float])

/** Multimodal-column support (north-star extension): schema, partition-wise
  * batch plumbing, and feature extraction for opaque binary media columns.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB — this container
  * has no image/audio codecs, so `decodeStub` derives pseudo-features from
  * an md5 over the payload. Everything around it is the real 100-TB shape:
  *
  *   - media stays an opaque `binary` column with typed metadata columns —
  *     scans prune to metadata unless features are actually needed;
  *   - decode runs via `Dataset.mapPartitions`: one JVM-side iterator per
  *     partition (the Scala analogue of arrow-batched decode UDFs), so any
  *     per-partition init (a real codec context) amortizes across rows;
  *   - outputs are fixed-shape `Array[Float]` columns that feed directly
  *     into the Vectors/Similarity operators (cosine top-k over image
  *     features works today).
  */
object Multimodal {

  /** Deterministic fake "decode": md5-expanded bytes scaled to [-0.5, 0.5).
    * REPLACE with a real codec in production — the signature is the
    * contract: payload -> fixed-dim feature vector. */
  private[engine] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Float](dim)
    var block = md.digest(payload)
    var i = 0
    while (i < dim) {
      if (i % 16 == 0 && i > 0) block = md.digest(block)
      out(i) = ((block(i % 16) & 0xff) / 255.0f) - 0.5f
      i += 1
    }
    out
  }

  /** Synthesize a deterministic media table from `documents` (payload =
    * UTF-8 text bytes; kind and metadata derived from doc_id) — the
    * testdata stand-in for a real binary-column source. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640 + 32).cast("int").as("width"),
      (col("n_chars") % 480 + 24).cast("int").as("height"),
      (lit(16000)).as("sample_rate"),
      (col("n_chars") * 10).as("duration_ms"))

  /** Feature extraction over the typed Dataset boundary: per-partition
    * iterator (batch shape), stubbed per-item decode. */
  def extractFeatures(media: Dataset[MediaItem], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs would init their context here, once per partition
      it.map(m => MediaFeatures(m.media_id, m.kind, m.payload.length,
        decodeStub(m.payload, dim)))
    }
  }

  /** "Resize" stub for images: recompute features on a payload truncated
    * proportionally to the target resolution — the plumbing contract is
    * (item, targetW, targetH) -> new metadata + new features. */
  def resize(media: Dataset[MediaItem], targetW: Int, targetH: Int, dim: Int): Dataset[MediaItem] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val keep = math.max(1,
          (m.payload.length.toLong * (targetW.toLong * targetH) /
            math.max(1L, m.width.toLong * m.height)).toInt.min(m.payload.length))
        m.copy(payload = m.payload.take(keep), width = targetW, height = targetH)
      }
    }
  }

  /** Frame sampling for "video": treat the payload as fixed-size frame
    * chunks, keep every `stride`-th, one feature row per kept frame. The
    * explode happens inside the partition iterator — no driver round-trip,
    * output rows stream. */
  def sampleFrames(media: Dataset[MediaItem], frameBytes: Int, stride: Int,
      dim: Int): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").as[MediaItem].mapPartitions { it =>
      it.flatMap { m =>
        m.payload.grouped(frameBytes).zipWithIndex
          .collect { case (chunk, idx) if idx % stride == 0 =>
            FrameFeatures(m.media_id, idx, decodeStub(chunk, dim)) }
      }
    }
  }
}
