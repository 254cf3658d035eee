package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns plus typed metadata, processed in partition-local batches.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic fake ([[fakeDecodeMeta]]):
  * it derives width/height/frame counts arithmetically from the byte
  * stream. Everything around it — schema, batch shape, partition-local
  * processing via mapPartitions, no driver-side collect — is the real
  * plumbing a codec drops into.
  */
object Multimodal {

  /** A media record as it travels through the engine. */
  case class MediaRecord(media_id: Long, payload: Array[Byte], mime: String)

  /** Extracted metadata (what a real decoder would emit). The checksum is
    * the md5 hex of the payload — a content id with an exact SQL twin, so
    * the whole decode row is oracle-checkable. */
  case class MediaMeta(media_id: Long, n_bytes: Int, width: Int, height: Int,
                       n_frames: Int, checksum: String)

  /** Deterministic fake decode, column form (codegen'd arithmetic — stands
    * in for a real `mapPartitions` decoder; see [[decodePartitions]]). */
  def fakeWidth(nBytes: Column): Column = ((nBytes % 64) + 1) * 16
  def fakeHeight(nBytes: Column): Column = ((nBytes % 48) + 1) * 16
  def fakeFrames(nBytes: Column): Column = (nBytes % 30) + 1

  /** Real partition-local decode shape: one decoder instance per partition
    * (a codec handle is expensive to open), rows streamed through it.
    * The decode body is the deterministic fake — swap `decodeOne` for a
    * real codec; the Spark plumbing does not change. */
  def decodePartitions(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition "codec" init happens here (once, not per row)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val n = r.payload.length
        // deterministic fake decode — replace with real codec call
        md.reset()
        val checksum = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaMeta(r.media_id, n, ((n % 64) + 1) * 16, ((n % 48) + 1) * 16, (n % 30) + 1, checksum)
      }
    }
  }

  /** Frame sampling: every k-th frame index of a clip, as the plumbing a
    * video pipeline needs (explode of a generated index sequence). */
  def sampleFrameIdx(nFrames: Column, every: Int): Column =
    sequence(lit(0), nFrames - 1, lit(every))

  /** Fake resize to a bounding box, aspect preserved: integer arithmetic
    * only (`div` = IntegralDivide on longs), so both engines compute
    * identical dimensions structurally — no double-division rounding to
    * drift from the oracle's floor division at any value range. A real
    * image op slots into [[decodePartitions]]; THIS models the metadata
    * contract a resize stage maintains. */
  def resizeDims(width: Column, height: Column, maxDim: Int): (Column, Column) = {
    val m = greatest(width, height).cast("long")
    (call_function("div", (width * maxDim).cast("long"), m).cast("int"),
      call_function("div", (height * maxDim).cast("long"), m).cast("int"))
  }

  /** Per-media feature vector (what an embedding model would emit):
    * 16-bucket byte histogram, L1-normalized — deterministic, fixed-size
    * array<double>, computed partition-locally with one "model" per
    * partition. Downstream it composes with the vector operators
    * (cosine top-k, dedup) exactly as real embeddings do. */
  case class MediaFeatures(media_id: Long, feat: Array[Double])

  def featurePartitions(ds: Dataset[MediaRecord], buckets: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition "model" init happens here (once, not per row)
      it.map { r =>
        val hist = new Array[Double](buckets)
        r.payload.foreach { b => hist(((b & 0xff) * buckets) / 256) += 1.0 }
        val n = math.max(1, r.payload.length).toDouble
        MediaFeatures(r.media_id, hist.map(_ / n))
      }
    }
  }
}
