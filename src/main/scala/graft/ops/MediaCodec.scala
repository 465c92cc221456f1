package graft.ops

/** Decoded media metadata (the row type behind
  * [[Multimodal.mediaMetaSchema]]). */
case class MediaMeta(byteLen: Long, width: Int, height: Int,
                     nFrames: Int, format: String)

/** The pluggable codec boundary for the multimodal operators.
  *
  * [[Multimodal.decode]] / [[Multimodal.resize]] /
  * [[Multimodal.featureExtract]] take a `MediaCodec` and never look at
  * media bytes themselves — all byte-level work (container parsing, pixel
  * scaling, encoder forward passes) happens behind this trait. Swapping
  * in a real JNI/FFI-backed implementation (libjpeg / ffmpeg / an ONNX
  * encoder) is a constructor argument, not an edit to the operators.
  *
  * Implementations must be [[Serializable]] — instances are shipped to
  * executors inside task closures. Expensive native handles should live
  * in a `@transient lazy val` so each executor JVM initializes them once
  * on first use rather than serializing them from the driver; the
  * operators additionally process rows in bounded batches, so per-batch
  * setup amortizes (the mapInPandas shape).
  */
trait MediaCodec extends Serializable {

  /** Parse the payload's container header into typed metadata. MUST
    * tolerate null/corrupt payloads (return empty-media metadata) — one
    * bad row must not fail a 100 TB partition. */
  def decode(payload: Array[Byte], modality: String): MediaMeta

  /** Transcode the payload to the target dimensions. */
  def resize(payload: Array[Byte], modality: String,
             width: Int, height: Int): Array[Byte]

  /** Embed the payload as a `dim`-length feature vector (the CLIP /
    * audio-encoder step). Deterministic per payload. */
  def embed(payload: Array[Byte], dim: Int): Array[Double]
}

/** Default codec: produces clearly-documented DETERMINISTIC results
  * derived from the payload bytes alone — which is exactly what makes
  * the multimodal queries cross-engine verifiable (the DuckDB oracle
  * recomputes identical metadata and vectors). The Spark-side plumbing
  * around it (schema, binary transport, batching, partitioning) is the
  * production shape. For REAL image payloads use [[ImageCodec]] (the
  * javax.imageio production instance); this stub stays the default so
  * the oracle-anchored queries remain engine-reproducible.
  */
object StubMediaCodec extends MediaCodec {

  /** Deterministic pseudo-metadata from the raw bytes. A real
    * implementation parses the container header here. */
  override def decode(payload: Array[Byte], modality: String): MediaMeta = {
    // null payload decodes as empty media
    val n = if (payload == null) 0L else payload.length.toLong
    val width = 64 + (n % 577).toInt
    val height = 64 + ((n * 31) % 353).toInt
    val frames = if (modality == "video") 1 + (n % 7).toInt else 1
    MediaMeta(n, width, height, frames, modality match {
      case "image" => "png"
      case "audio" => "wav"
      case "video" => "mp4"
      case _       => "bin"
    })
  }

  /** Stub scaler: bytes pass through unchanged (a real implementation
    * transcodes to the target dimensions). */
  override def resize(payload: Array[Byte], modality: String,
                      width: Int, height: Int): Array[Byte] = payload

  /** md5-derived embedding: feature j = first 32 bits of
    * md5(j + "|" + md5(payload)) scaled to [0,1). Engine-reproducible;
    * a real encoder forward pass swaps in here. */
  override def embed(payload: Array[Byte], dim: Int): Array[Double] = {
    val base =
      if (payload == null) graft.functions.TextKernels.md5Hex("")
      else graft.functions.TextKernels.md5Hex2(Array.empty[Byte], payload)
    Array.tabulate(dim) { j =>
      val h = graft.functions.TextKernels.md5Hex(s"$j|$base")
      java.lang.Long.parseLong(h.substring(0, 8), 16).toDouble / 4294967296.0
    }
  }
}
