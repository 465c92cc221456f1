package graft.ops

import java.io.ByteArrayOutputStream

/** Production [[MediaCodec]] instance for VIDEO: MJPEG-in-AVI, parsed
  * with a self-contained RIFF walker and per-frame JPEG work delegated
  * to the JVM's bundled `javax.imageio` — no native dependency, so it
  * ships everywhere the library does. The fourth codec behind the trait
  * (after [[StubMediaCodec]], [[ImageCodec]], [[AudioCodec]]): it makes
  * the VIDEO path of the multimodal operators real for the one video
  * container a bare JVM can honestly decode. Formats needing licensed
  * or native codecs (H.264/VP9/AV1) still belong behind a JNI/FFI
  * implementation of the same trait — swapping it in remains a
  * constructor argument, not an operator edit.
  *
  * Scale behavior, per the trait contract:
  *  - `decode` walks RIFF headers only (the `avih` main header carries
  *    width/height/total frames) — no pixel decode, so metadata over a
  *    100 TB payload column costs header bytes per row.
  *  - null / corrupt / non-AVI payloads NEVER throw: decode returns
  *    zero metadata with format "corrupt" (or "empty"), resize passes
  *    the payload through, embed returns the zero vector.
  *  - `frames` streams `movi` chunks lazily; embed samples at most
  *    [[EmbedFrameSamples]] evenly-spaced frames, so per-row work is
  *    bounded regardless of clip length.
  *  - The object holds no native state; it serializes into task
  *    closures by reference.
  */
object VideoCodec extends MediaCodec {

  /** Frames sampled (evenly spaced) by [[embed]] — bounds per-row work
    * on long clips. */
  val EmbedFrameSamples: Int = 4

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Header-only metadata from the `avih` main AVI header (width,
    * height, total frames). */
  override def decode(payload: Array[Byte], modality: String): MediaMeta = {
    if (payload == null || payload.isEmpty)
      return MediaMeta(0L, 0, 0, 0, "empty")
    val n = payload.length.toLong
    try {
      if (payload.length < 24 || fourCC(payload, 0) != "RIFF" ||
        fourCC(payload, 8) != "AVI ")
        return MediaMeta(n, 0, 0, 0, "corrupt")
      // walk top-level + hdrl chunks looking for avih
      var meta: MediaMeta = null
      def walk(off0: Int, end: Int): Unit = {
        var off = off0
        while (meta == null && off + 8 <= end) {
          val id = fourCC(payload, off)
          val sz = le32(payload, off + 4)
          if (sz < 0 || off + 8 + sz > payload.length) return
          if (id == "LIST") walk(off + 12, off + 8 + sz)
          else if (id == "avih" && sz >= 40) {
            // avih layout: ..., dwTotalFrames at +16, dwWidth at +32,
            // dwHeight at +36 (all DWORD LE)
            val d = off + 8
            meta = MediaMeta(n, le32(payload, d + 32), le32(payload, d + 36),
              le32(payload, d + 16), "avi")
          }
          off += 8 + sz + (sz & 1) // chunks pad to even
        }
      }
      walk(12, payload.length)
      if (meta == null) MediaMeta(n, 0, 0, 0, "corrupt") else meta
    } catch {
      case _: Exception => MediaMeta(n, 0, 0, 0, "corrupt")
    }
  }

  /** Lazily iterate the JPEG payloads of the `movi` list ('??dc'/'??db'
    * chunks). Empty on corrupt input — never throws. */
  def frames(payload: Array[Byte]): Iterator[Array[Byte]] = {
    if (payload == null || payload.length < 24 ||
      fourCC(payload, 0) != "RIFF" || fourCC(payload, 8) != "AVI ")
      return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    try {
      def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
        var off = off0
        while (off + 8 <= end) {
          val id = fourCC(payload, off)
          val sz = le32(payload, off + 4)
          if (sz < 0 || off + 8 + sz > payload.length) return
          if (id == "LIST") {
            val listType = fourCC(payload, off + 8)
            walk(off + 12, off + 8 + sz, inMovi || listType == "movi")
          } else if (inMovi && id.length == 4 &&
            (id.endsWith("dc") || id.endsWith("db"))) {
            out += ((off + 8, sz))
          }
          off += 8 + sz + (sz & 1)
        }
      }
      walk(12, payload.length, inMovi = false)
    } catch { case _: Exception => () }
    out.iterator.map { case (o, s) => java.util.Arrays.copyOfRange(payload, o, o + s) }
  }

  /** Extract one frame (JPEG bytes) by index, or null when out of
    * range / corrupt — composes with [[Multimodal.sampleFrames]]'s
    * exploded (id, frame_idx) rows. */
  def extractFrame(payload: Array[Byte], idx: Int): Array[Byte] = {
    if (idx < 0) return null
    val it = frames(payload).drop(idx)
    if (it.hasNext) it.next() else null
  }

  /** Transcode every frame to (width, height) — per-frame bilinear
    * rescale through the shared image path, re-encoded as JPEG inside
    * a rebuilt MJPEG AVI. Corrupt payloads pass through unchanged. */
  override def resize(payload: Array[Byte], modality: String,
                      width: Int, height: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty || width <= 0 || height <= 0)
      return payload
    try {
      val fs = frames(payload).map { jb =>
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jb))
        if (src == null) return payload
        val dst = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, width, height, null)
        } finally g.dispose()
        val bo = new ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "jpeg", bo)
        bo.toByteArray
      }.toArray
      if (fs.isEmpty) payload else encodeAvi(fs, width, height)
    } catch {
      case _: Exception => payload
    }
  }

  /** Deterministic clip feature vector: up to [[EmbedFrameSamples]]
    * evenly-spaced frames each embed through [[ImageCodec]]'s pixel
    * grid, and the clip vector is their per-coordinate mean — a tiny
    * "mean-pooled patch embedding" whose cosine geometry tracks global
    * color/layout over time, plugging straight into the ANN operators.
    * Null/corrupt payloads embed as the zero vector. */
  override def embed(payload: Array[Byte], dim: Int): Array[Double] = {
    val zero = new Array[Double](dim)
    if (payload == null || payload.isEmpty || dim <= 0) return zero
    try {
      val all = frames(payload).toArray
      if (all.isEmpty) return zero
      val k = math.min(EmbedFrameSamples, all.length)
      val acc = new Array[Double](dim)
      var s = 0
      while (s < k) {
        val fi = (s.toLong * (all.length - 1) / math.max(k - 1, 1)).toInt
        val fv = ImageCodec.embed(all(fi), dim)
        var j = 0
        while (j < dim) { acc(j) += fv(j); j += 1 }
        s += 1
      }
      var j = 0
      while (j < dim) { acc(j) /= k; j += 1 }
      acc
    } catch {
      case _: Exception => zero
    }
  }

  /** Encode JPEG frames as a minimal MJPEG AVI container (RIFF / hdrl
    * with avih + one video strl / movi with 00dc chunks). Enough
    * structure for this codec, ffmpeg, and any RIFF walker to read
    * back; used by tests to synthesize real payloads. */
  private[ops] def encodeAvi(jpegFrames: Array[Array[Byte]], width: Int,
                             height: Int, fps: Int = 10): Array[Byte] = {
    require(jpegFrames.nonEmpty, "need at least one frame")
    def dw(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if ((data.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
      cc(id) ++ dw(data.length) ++ data ++ pad
    }
    def list(listType: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(listType) ++ data)
    val maxBuf = jpegFrames.map(_.length).max
    val avih = dw(1000000 / fps) ++ dw(maxBuf * fps) ++ dw(0) ++ dw(0x10) ++
      dw(jpegFrames.length) ++ dw(0) ++ dw(1) ++ dw(maxBuf) ++
      dw(width) ++ dw(height) ++ dw(0) ++ dw(0) ++ dw(0) ++ dw(0)
    val strh = cc("vids") ++ cc("MJPG") ++ dw(0) ++ dw(0) ++ dw(0) ++
      dw(1) ++ dw(fps) ++ dw(0) ++ dw(jpegFrames.length) ++ dw(maxBuf) ++
      dw(-1) ++ dw(0) ++ dw(0) ++ dw(0)
    val strf = dw(40) ++ dw(width) ++ dw(height) ++
      Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ cc("MJPG") ++
      dw(width * height * 3) ++ dw(0) ++ dw(0) ++ dw(0) ++ dw(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      jpegFrames.flatMap(f => chunk("00dc", f)))
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ dw(body.length) ++ body
  }
}
