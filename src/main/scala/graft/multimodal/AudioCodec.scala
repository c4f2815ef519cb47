package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio codec over the JDK's built-in `javax.sound.sampled`
  * (PCM WAV/AU/AIFF — no external libraries): decode to normalized
  * mono samples and extract a fixed-width feature vector (per-frame
  * RMS energy — the classic loudness envelope). Pure functions of the
  * payload bytes: two containers carrying the SAME samples (WAV vs AU)
  * produce identical features, which is what perceptual audio dedup
  * needs and byte-level dedup cannot see.
  *
  * Used by [[BinaryPipeline]] for `kind = "audio"` rows; video remains
  * the one stubbed modality (the JDK ships no video codecs).
  */
object AudioCodec {

  /** 8 frames × (RMS energy, zero-crossing rate) = 16 features. */
  val frames = 8
  val dim: Int = frames * 2

  /** Decode any JDK-supported container to normalized mono double
    * samples in [-1, 1] (16-bit signed PCM intermediate).
    */
  def samples(bytes: Array[Byte]): Array[Double] = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val src = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, 1, 2, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      val raw = pcm.readAllBytes()
      val out = new Array[Double](raw.length / 2)
      var i = 0
      while (i < out.length) {
        val lo = raw(2 * i) & 0xff
        val hi = raw(2 * i + 1).toInt
        out(i) = ((hi << 8) | lo) / 32768.0
        i += 1
      }
      out
    } finally in.close()
  }

  /** Feature vector: per-frame RMS energy (loudness envelope, slots
    * 0–7, scaled ×2 for headroom) and per-frame zero-crossing rate
    * (pitch proxy, slots 8–15, scaled ×4 to occupy [0,1] over the
    * speech/music ZCR range). Both clamped to [0,1].
    */
  def features(bytes: Array[Byte]): Array[Float] =
    featuresOf(samples(bytes))

  /** Feature extraction over already-decoded samples — shared by the
    * JDK container path above and non-JDK decoders ([[AdpcmCodec]]),
    * so every audio codec arm lands in the same feature space and
    * cross-codec perceptual dedup works.
    */
  def featuresOf(s: Array[Double]): Array[Float] = {
    require(s.nonEmpty, "audio payload decoded to zero samples")
    val out = new Array[Float](dim)
    var f = 0
    while (f < frames) {
      val from = (s.length.toLong * f / frames).toInt
      val until = math.min(
        math.max((s.length.toLong * (f + 1) / frames).toInt, from + 1),
        s.length)
      var acc = 0.0
      var zc = 0
      var i = from
      while (i < until) {
        acc += s(i) * s(i)
        if (i > from && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
        i += 1
      }
      val n = until - from
      // clips shorter than `frames` samples leave later frames empty
      out(f) =
        if (n == 0) 0f else math.min(1.0, 2.0 * math.sqrt(acc / n)).toFloat
      out(frames + f) =
        if (n == 0) 0f
        else math.min(1.0, 4.0 * zc / math.max(1, n - 1)).toFloat
      f += 1
    }
    out
  }

  /** Re-container audio: decode any JDK-supported payload and write the
    * IDENTICAL 16-bit mono samples in the requested container ("wav" or
    * "au"). The output is byte-different from the input but
    * sample-identical — the canonical perceptual-dedup test pair
    * (features, and therefore phashes, must collide at hamming 0).
    */
  def transcode(bytes: Array[Byte], format: String): Array[Byte] = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val src = in.getFormat
      // AU is a big-endian container; WAV little-endian. Matching the
      // target endianness avoids a writer-side conversion surprise.
      val big = format == "au"
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, 1, 2, src.getSampleRate, big)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      val raw = pcm.readAllBytes()
      val stream = new AudioInputStream(
        new ByteArrayInputStream(raw), target, raw.length / 2L)
      val out = new ByteArrayOutputStream()
      val fileType = format match {
        case "wav" => AudioFileFormat.Type.WAVE
        case "au" => AudioFileFormat.Type.AU
        case other => throw new IllegalArgumentException(s"format: $other")
      }
      AudioSystem.write(stream, fileType, out)
      out.toByteArray
    } finally in.close()
  }

  /** Deterministic test tone: `ms` milliseconds of a sine at `hz` with a
    * second harmonic, 16-bit mono 8 kHz PCM in the requested container
    * ("wav" or "au").
    */
  def synthTone(hz: Double, ms: Int, format: String = "wav",
      amplitude: Double = 0.5): Array[Byte] =
    synthMelody(Seq((hz, amplitude)), ms, format)

  /** Concatenated tone segments — one (hz, amplitude) per EQUAL time
    * slice of the clip. A clip with [[frames]] segments puts an
    * independent (loudness, pitch) pair in every feature frame, so the
    * perceptual-hash cell space grows combinatorially (~20^8) instead
    * of the single steady tone's ~20 cells — what a SCALED media
    * corpus needs for near-dup pair counts to stay linear in corpus
    * size (see MultimodalOps.scaleAssets). One segment ≡ the steady
    * tone [[synthTone]] has always produced.
    */
  def synthMelody(segments: Seq[(Double, Double)], ms: Int,
      format: String = "wav"): Array[Byte] = {
    require(segments.nonEmpty, "need at least one segment")
    val rate = 8000f
    val n = (rate * ms / 1000).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val t = i / rate.toDouble
      val (hz, amplitude) = segments(
        math.min(i.toLong * segments.length / n, segments.length - 1L).toInt)
      val v = amplitude * (math.sin(2 * math.Pi * hz * t) +
        0.25 * math.sin(4 * math.Pi * hz * t)) / 1.25
      val s = math.max(-32768, math.min(32767, math.round(v * 32767))).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate, 16, 1, 2, rate, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    val fileType = format match {
      case "wav" => AudioFileFormat.Type.WAVE
      case "au" => AudioFileFormat.Type.AU
      case other => throw new IllegalArgumentException(s"format: $other")
    }
    AudioSystem.write(stream, fileType, out)
    out.toByteArray
  }
}
