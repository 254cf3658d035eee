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
  /** 60-bit perceptual aHash over the decoded payload — the image
    * near-dup fingerprint computed at the partition-local decode seam
    * (a real pipeline hashes the decoded luma plane here; the byte
    * payload stands in, same shape). Blocks are FIXED 8-byte windows at
    * absolute positions (first 60 blocks = first 480 bytes): absolute
    * blocks keep the fingerprint stable under tail edits, which is how
    * the corpus's near-dups differ — relative (i·60/L) blocks shift
    * every boundary when the length changes and flipped ≥8 bits on true
    * near-dup pairs, leaving a distance-3 gate vacuous. Bit b is set
    * iff block b's mean byte exceeds the hashed-prefix mean, compared
    * by integer cross-multiply (sum_b·n > total·n_b) so the signature
    * is EXACT and the DuckDB oracle recomputes it bit-for-bit with
    * ascii()/integer division. Empty payload → 0. */
  def perceptualHash(payload: Array[Byte]): Long = {
    val L = math.min(payload.length, 480)
    if (L == 0) return 0L
    val sums = new Array[Long](60)
    val counts = new Array[Long](60)
    var total = 0L
    var i = 0
    while (i < L) {
      val b = i / 8
      val v = payload(i) & 0xffL
      sums(b) += v; counts(b) += 1; total += v
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 60) {
      if (sums(b) * L > total * counts(b)) h |= 1L << b
      b += 1
    }
    h
  }

  case class MediaHash(media_id: Long, simhash: Long)

  /** Per-partition perceptual hashing — one decode-seam pass emitting the
    * (media_id, 60-bit aHash) relation the Hamming-LSH banding consumes. */
  def perceptualPartitions(ds: Dataset[MediaRecord]): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map(r => MediaHash(r.media_id, perceptualHash(r.payload)))
    }
  }
}
