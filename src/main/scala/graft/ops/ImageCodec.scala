package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Production [[MediaCodec]] instance for IMAGES, built entirely on the
  * JVM's bundled `javax.imageio` (PNG / JPEG / BMP / GIF — no native
  * dependency, so it ships everywhere the library does). This is the
  * second codec behind the trait after [[StubMediaCodec]], proving the
  * multimodal operators' injection seam with a REAL decoder: decode
  * parses actual container headers, resize re-renders pixels, embed is
  * a deterministic pixel-grid feature vector usable by the ANN
  * operators.
  *
  * Scale behavior, per the trait contract:
  *  - `decode` reads the HEADER ONLY (ImageReader.getWidth/getHeight on
  *    the stream — no pixel decode), so metadata extraction over a
  *    100 TB payload column costs header bytes per row, not full
  *    decodes.
  *  - null / corrupt / non-image payloads NEVER throw: decode returns
  *    zero-dimension metadata with format "corrupt" (or "empty"),
  *    resize passes the payload through unchanged, embed returns the
  *    zero vector. One bad row must not fail a partition.
  *  - Instances hold no native state; the object serializes into task
  *    closures by reference (Scala object), satisfying the
  *    Serializable requirement trivially.
  *
  * ImageIO plugin lookup is JVM-global and thread-safe; `ImageIO.read`
  * allocates per call, so the operators' bounded batching keeps peak
  * memory at batchSize × decoded-image bytes per partition.
  */
object ImageCodec extends MediaCodec {

  /** Header-only metadata: width/height/format from the registered
    * reader for the payload's container signature; frame count via the
    * reader's index scan (1 for PNG/JPEG, animation length for GIF). */
  override def decode(payload: Array[Byte], modality: String): MediaMeta = {
    if (payload == null || payload.isEmpty)
      return MediaMeta(0L, 0, 0, 0, "empty")
    val n = payload.length.toLong
    // EVERYTHING inside the try — with ImageIO's default disk cache,
    // createImageInputStream itself can throw (full/read-only tmpdir on
    // a busy executor), and the never-throw contract must hold there too
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      val readers =
        if (iis == null) java.util.Collections.emptyIterator[javax.imageio.ImageReader]()
        else ImageIO.getImageReaders(iis)
      if (!readers.hasNext) MediaMeta(n, 0, 0, 0, "corrupt")
      else {
        val r = readers.next()
        try {
          r.setInput(iis, false, true)
          val frames =
            try math.max(r.getNumImages(true), 1)
            catch { case _: Exception => 1 }
          MediaMeta(n, r.getWidth(0), r.getHeight(0), frames,
            r.getFormatName.toLowerCase(java.util.Locale.ROOT))
        } finally r.dispose()
      }
    } catch {
      case _: Exception => MediaMeta(n, 0, 0, 0, "corrupt")
    } finally if (iis != null) {
      try iis.close() catch { case _: Exception => () }
    }
  }

  /** Re-render to exactly (width, height) with bilinear interpolation
    * and re-encode as PNG (lossless, always-available writer). Corrupt
    * or undecodable payloads pass through unchanged — the decode
    * metadata already marks them, and dropping bytes silently would
    * lose the row's provenance. */
  override def resize(payload: Array[Byte], modality: String,
                      width: Int, height: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty) return payload
    try {
      val src = ImageIO.read(new ByteArrayInputStream(payload))
      if (src == null) return payload
      val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, width, height, null)
      } finally g.dispose()
      val out = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", out)
      out.toByteArray
    } catch {
      case _: Exception => payload
    }
  }

  /** Deterministic pixel feature vector: the image is resampled onto a
    * fixed evaluation grid and feature j is the R/G/B channel
    * (j mod 3) of grid cell (j div 3), scaled to [0, 1) — a tiny
    * "patch embedding" whose cosine geometry tracks global color/layout
    * similarity, so the output plugs straight into the ANN operators
    * (near-identical images are cosine-near; unrelated ones are not).
    * A learned encoder (ONNX/JNI forward pass) swaps in behind the same
    * method. Null/corrupt payloads embed as the zero vector. */
  override def embed(payload: Array[Byte], dim: Int): Array[Double] = {
    val zero = new Array[Double](dim)
    if (payload == null || payload.isEmpty) return zero
    try {
      val src = ImageIO.read(new ByteArrayInputStream(payload))
      if (src == null) return zero
      val cells = (dim + 2) / 3
      val g = math.max(1, math.ceil(math.sqrt(cells.toDouble)).toInt)
      val w = src.getWidth
      val h = src.getHeight
      Array.tabulate(dim) { j =>
        val cell = j / 3
        val cx = cell % g
        val cy = cell / g
        // center-of-cell sampling on the g×g grid, clamped into bounds
        val px = math.min(w - 1, ((cx + 0.5) * w / g).toInt)
        val py = math.min(h - 1, ((cy + 0.5) * h / g).toInt)
        val rgb = src.getRGB(px, py)
        val channel = j % 3 match {
          case 0 => (rgb >> 16) & 0xFF
          case 1 => (rgb >> 8) & 0xFF
          case _ => rgb & 0xFF
        }
        channel / 256.0
      }
    } catch {
      case _: Exception => zero
    }
  }
}
