package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, and batch feature extraction over the bytes via `mapPartitions`
  * (the Scala analog of a vectorized decode UDF: per-partition imperative
  * loop, one decoder instance per task, streaming through the rows).
  *
  * The decode step is a PLUGGABLE SEAM ([[MediaDecoder]]): the default
  * [[StubDecoder]] is a deterministic byte-level computation (no media codecs
  * in this container), so the Spark-side plumbing (schema, batching,
  * partition layout) is real and oracle-checkable while a production pipeline
  * injects its codec by implementing one trait — `open()` runs once per task
  * (codec/library init), `decode` per row. [[extractWith]] generalizes the
  * output schema to any caller-defined case class.
  */
object Multimodal {

  final case class MediaFeature(
      doc_id: Long, n_bytes: Long, sha256: String, sum_bytes: Long, mean_byte: Double)

  /** The injectable decode strategy: bytes → fixed feature struct. One
    * instance is deserialized per task; `open()` is called once before the
    * first row — the codec-initialization hook a real decoder needs.
    */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(id: Long, bytes: Array[Byte]): MediaFeature
  }

  /** Default decoder: stands in for image/audio decode. Deterministic
    * byte-level "features" so results are verifiable; a real pipeline swaps
    * in a codec-backed [[MediaDecoder]] without touching the Spark plumbing.
    */
  object StubDecoder extends MediaDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeature = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(bytes).map(b => f"$b%02x").mkString
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
      MediaFeature(id, bytes.length.toLong, hex, sum,
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
    }
  }

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

  /** Per-partition feature extraction over the binary column through the
    * injected decoder (default: the stub).
    */
  def extractFeatures(
      withMedia: DataFrame, idCol: String,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeature] =
    extractWith(withMedia, idCol) { () =>
      decoder.open()
      (id, bytes) => decoder.decode(id, bytes)
    }(Encoders.product[MediaFeature])

  /** Fully generic decode cell: caller-defined output schema. `init` runs
    * once per task and returns the per-row decode function — the
    * init-once/stream-rows shape every real codec wants. All multimodal
    * extraction funnels through here, so the partitioning/batching behavior
    * is identical whatever the decoder.
    */
  def extractWith[T](withMedia: DataFrame, idCol: String)(
      init: () => (Long, Array[Byte]) => T)(implicit enc: Encoder[T]): Dataset[T] = {
    val src = withMedia.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      val decode = init() // one decoder per task
      it.map { case (id, bytes) => decode(id, bytes) }
    }(enc)
  }

  final case class FrameSample(doc_id: Long, frame_idx: Long, frame_md5: String)

  /** Video frame sampling: one media row fans out to every `stride`-th
    * fixed-size frame, at most `maxFrames` per doc — the 1→N batch shape of
    * a real frame extractor (decoder per task, frames streamed out, never a
    * whole-video array on the heap). `frameDigest` is the per-frame seam
    * (default md5 of the stub byte slice); a real pipeline swaps in the
    * codec keyframe read + embedding.
    */
  def sampleFrames(
      withMedia: DataFrame, idCol: String, frameBytes: Int, stride: Int,
      maxFrames: Int,
      frameDigest: Array[Byte] => String = defaultFrameDigest): Dataset[FrameSample] = {
    val src = withMedia.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).take(maxFrames).iterator.map { f =>
          val slice = java.util.Arrays.copyOfRange(
            bytes, f * frameBytes, (f + 1) * frameBytes)
          FrameSample(id, f.toLong, frameDigest(slice))
        }
      }
    }(Encoders.product[FrameSample])
  }

  private def defaultFrameDigest(slice: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(slice).map(b => f"$b%02x").mkString
  }
}
