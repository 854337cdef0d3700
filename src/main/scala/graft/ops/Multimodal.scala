package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, and batch feature extraction over the bytes via `mapPartitions`
  * (the Scala analog of a vectorized decode UDF: per-partition imperative
  * loop, one decoder instance per task, streaming through the rows).
  *
  * The actual image/audio decode is STUBBED (`decodeStub`) — no media codecs
  * in this container — with a deterministic byte-level computation, so the
  * Spark-side plumbing (schema, batching, partition layout) is real and
  * oracle-checkable while the codec call is a drop-in replacement point.
  */
object Multimodal {

  final case class MediaFeature(
      doc_id: Long, n_bytes: Long, sha256: String, sum_bytes: Long, mean_byte: Double)

  /** Attach a fake media column: utf-8 bytes of the text + typed metadata
    * (what a real pipeline would carry: dimensions, format tag).
    */
  def attachBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol), col(textCol),
      to_binary(col(textCol), lit("utf-8")).as("media"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        ((col("n_chars") * 7) % 480).cast("int").as("height"),
        lit("fake/png").as("format")).as("media_meta"))

  /** STUB decoder: stands in for image/audio decode. Deterministic byte-level
    * "features" so results are verifiable; a real pipeline swaps the body for
    * a codec call without touching the Spark plumbing around it.
    */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaFeature = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(bytes).map(b => f"$b%02x").mkString
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
    MediaFeature(id, bytes.length.toLong, hex, sum,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
  }

  /** Per-partition feature extraction over the binary column. */
  def extractFeatures(withMedia: DataFrame, idCol: String): Dataset[MediaFeature] = {
    val src = withMedia.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      // one "decoder" per task — where a real codec would be initialized once
      it.map { case (id, bytes) => decodeStub(id, bytes) }
    }(Encoders.product[MediaFeature])
  }

  final case class FrameSample(doc_id: Long, frame_idx: Long, frame_md5: String)

  /** Video frame sampling: one media row fans out to every `stride`-th
    * fixed-size frame, at most `maxFrames` per doc — the 1→N batch shape of
    * a real frame extractor (decoder per task, frames streamed out, never a
    * whole-video array on the heap). The frame "decode" is the stub byte
    * slice; a real pipeline swaps in the codec keyframe read.
    */
  def sampleFrames(
      withMedia: DataFrame, idCol: String, frameBytes: Int, stride: Int,
      maxFrames: Int): Dataset[FrameSample] = {
    val src = withMedia.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { case (id, bytes) =>
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).take(maxFrames).iterator.map { f =>
          val slice = java.util.Arrays.copyOfRange(
            bytes, f * frameBytes, (f + 1) * frameBytes)
          md.reset()
          FrameSample(id, f.toLong,
            md.digest(slice).map(b => f"$b%02x").mkString)
        }
      }
    }(Encoders.product[FrameSample])
  }
}
