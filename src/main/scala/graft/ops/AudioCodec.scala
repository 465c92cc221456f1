package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Production [[MediaCodec]] instance for AUDIO, built entirely on the
  * JVM's bundled `javax.sound.sampled` (WAV / AIFF / AU containers,
  * PCM + ULAW/ALAW encodings — no native dependency, so it ships
  * everywhere the library does). The third codec behind the trait after
  * [[StubMediaCodec]] and [[ImageCodec]]: it makes the AUDIO path of
  * the multimodal operators real the way ImageCodec made images real
  * (reference sgdnet has no media surface; this is part of the
  * training-data-pipeline extension the project brief requires).
  *
  * MediaMeta field mapping for audio (the schema is shaped by images,
  * so the mapping is documented rather than renamed):
  *  - `width`   = sample rate in Hz
  *  - `height`  = channel count
  *  - `nFrames` = sample-frame count (duration = nFrames / width)
  *
  * Scale behavior, per the trait contract:
  *  - `decode` parses the container HEADER only
  *    (AudioSystem.getAudioFileFormat — no PCM decode), so metadata
  *    over a 100 TB payload column costs header bytes per row.
  *  - null / corrupt / non-audio payloads NEVER throw: decode returns
  *    zero metadata with format "corrupt" (or "empty"), resize passes
  *    the payload through, embed returns the zero vector.
  *  - Resampling is implemented IN-CODEC (linear interpolation on the
  *    decoded PCM): the JDK's AudioSystem converts encodings and
  *    channel layouts but does not guarantee a sample-rate conversion
  *    provider, and a hand-rolled kernel is deterministic across JVMs.
  *  - The object holds no native state; it serializes into task
  *    closures by reference.
  */
object AudioCodec extends MediaCodec {

  /** Header-only metadata: rate/channels/frames from the container
    * header. Works for any format javax.sound registers (WAV, AIFF,
    * AU); frameLength -1 (unknown, e.g. streamed containers) reports 0
    * frames rather than a negative count. */
  override def decode(payload: Array[Byte], modality: String): MediaMeta = {
    if (payload == null || payload.isEmpty)
      return MediaMeta(0L, 0, 0, 0, "empty")
    val n = payload.length.toLong
    try {
      val aff: AudioFileFormat =
        AudioSystem.getAudioFileFormat(new ByteArrayInputStream(payload))
      val f = aff.getFormat
      val frames = math.max(aff.getFrameLength.toLong, 0L)
      MediaMeta(n, math.round(f.getSampleRate).toInt, f.getChannels,
        // nFrames is an Int in MediaMeta; clamp absurd headers
        math.min(frames, Int.MaxValue.toLong).toInt,
        aff.getType.getExtension.toLowerCase(java.util.Locale.ROOT))
    } catch {
      case _: Exception => MediaMeta(n, 0, 0, 0, "corrupt")
    }
  }

  /** "Resize" for audio = transcode to (`width` Hz, `height` channels)
    * as 16-bit signed little-endian PCM WAV: decode via the JDK's
    * encoding converters, mix down (average) or duplicate channels,
    * then linear-interpolation resample. Corrupt or undecodable
    * payloads pass through unchanged — decode metadata already marks
    * them, and silently dropping bytes would lose provenance. */
  override def resize(payload: Array[Byte], modality: String,
                      width: Int, height: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty || width <= 0 || height <= 0)
      return payload
    try {
      val (samples, srcRate, srcCh) = decodePcm(payload)
      if (samples.length == 0) return payload
      val srcFrames = samples.length / srcCh
      // channel conversion first (on the source grid)
      val chans = Array.tabulate(height) { c =>
        if (height < srcCh) {
          // mixdown: target channel c is the integer average of every
          // source channel s with s % height == c (so 2→1 averages
          // L+R, 4→2 averages FL+RL into L and FR+RR into R) — never
          // a selection that silently drops source channels
          val srcs = (0 until srcCh).filter(_ % height == c)
          Array.tabulate(srcFrames) { i =>
            var s = 0L
            srcs.foreach(k => s += samples(i * srcCh + k))
            (s / srcs.length).toShort
          }
        } else {
          // upmix: duplicate source channels round-robin
          val src = c % srcCh
          Array.tabulate(srcFrames)(i => samples(i * srcCh + src))
        }
      }
      // linear resample each channel to the target rate
      val dstFrames = math.max(1,
        math.round(srcFrames.toLong * width.toDouble / srcRate).toInt)
      val out = new Array[Short](dstFrames * height)
      var i = 0
      while (i < dstFrames) {
        // source position of target frame i (same endpoints mapping at
        // any rate ratio; deterministic double arithmetic)
        val pos = i.toDouble * (srcFrames - 1).toDouble /
          math.max(dstFrames - 1, 1).toDouble
        val i0 = pos.toInt
        val i1 = math.min(i0 + 1, srcFrames - 1)
        val frac = pos - i0
        var c = 0
        while (c < height) {
          val v = chans(c)(i0) * (1.0 - frac) + chans(c)(i1) * frac
          out(i * height + c) = math.max(Short.MinValue.toDouble,
            math.min(Short.MaxValue.toDouble, math.rint(v))).toShort
          c += 1
        }
        i += 1
      }
      encodeWav(out, width, height)
    } catch {
      case _: Exception => payload
    }
  }

  /** Deterministic audio feature vector: the mono mixdown is split into
    * `dim` equal windows and feature j is the RMS energy of window j
    * scaled to [0, 1) — an energy-envelope "embedding" whose cosine
    * geometry tracks loudness shape over time, so near-identical clips
    * are cosine-near through the standard ANN operators. A learned
    * audio encoder (ONNX/JNI forward pass) swaps in behind the same
    * method. Null/corrupt payloads embed as the zero vector. */
  override def embed(payload: Array[Byte], dim: Int): Array[Double] = {
    val zero = new Array[Double](dim)
    if (payload == null || payload.isEmpty || dim <= 0) return zero
    try {
      val (samples, _, ch) = decodePcm(payload)
      val frames = samples.length / math.max(ch, 1)
      if (frames == 0) return zero
      Array.tabulate(dim) { j =>
        val lo = (j.toLong * frames / dim).toInt
        val hi = math.max(((j + 1).toLong * frames / dim).toInt, lo + 1)
        var ss = 0.0
        var i = lo
        while (i < math.min(hi, frames)) {
          // mono mixdown per frame, same integer average as resize
          var s = 0L
          var k = 0
          while (k < ch) { s += samples(i * ch + k); k += 1 }
          val m = (s / ch).toDouble
          ss += m * m
          i += 1
        }
        val cnt = math.max(math.min(hi, frames) - lo, 1)
        math.sqrt(ss / cnt) / 32768.0
      }
    } catch {
      case _: Exception => zero
    }
  }

  /** Decode any supported container/encoding to interleaved 16-bit
    * signed samples via the JDK's format converters (ULAW/ALAW/8-bit →
    * PCM_SIGNED 16 is a guaranteed JDK conversion; sample rate is left
    * untouched here). Returns (samples, rate, channels). */
  private def decodePcm(payload: Array[Byte]): (Array[Short], Int, Int) = {
    var in: AudioInputStream = null
    var pcm: AudioInputStream = null
    try {
      in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val f = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
        f.getSampleRate, false)
      pcm = if (f.matches(target)) in
        else AudioSystem.getAudioInputStream(target, in)
      val bytes = pcm.readAllBytes()
      val out = new Array[Short](bytes.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
        i += 1
      }
      (out, math.round(f.getSampleRate), f.getChannels)
    } finally {
      if (pcm != null) { try pcm.close() catch { case _: Exception => () } }
      if (in != null && (in ne pcm)) {
        try in.close() catch { case _: Exception => () }
      }
    }
  }

  /** Encode interleaved 16-bit samples as a PCM WAV container. */
  private[ops] def encodeWav(samples: Array[Short], rate: Int,
                             channels: Int): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, channels, 2 * channels, rate.toFloat, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
      samples.length / channels)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
