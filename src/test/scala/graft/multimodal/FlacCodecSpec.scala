package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[FlacCodec]] is verified against a spec-side FLAC ENCODER (bottom of
  * this file) — real compressed fixtures the decoder did not produce,
  * same discipline as the ADPCM arm. FLAC is lossless, so every
  * round-trip assertion here is BIT-EXACT equality, and the cross-codec
  * dedup assertion is hamming distance exactly 0.
  */
class FlacCodecSpec extends AnyFunSuite with Matchers {

  private lazy val spark = graft.TestSpark.spark

  /** Deterministic 16-bit test signal: sine + harmonic + id-keyed phase. */
  private def tone(n: Int, hz: Double = 440, amp: Double = 0.4): Array[Int] =
    Array.tabulate(n) { i =>
      val t = i / 8000.0
      val v = amp * (math.sin(2 * math.Pi * hz * t) +
        0.25 * math.sin(4 * math.Pi * hz * t)) / 1.25
      math.max(-32768, math.min(32767, math.round(v * 32767))).toInt
    }

  test("javax.sound cannot read FLAC; the pure-JVM arm decodes bit-exactly") {
    val pcm = tone(1000) // 192-sample blocks → 5 full frames + a 40-sample tail
    val flac = FlacEncoder.encode(Array(pcm), rate = 8000)
    flac.length should be < pcm.length * 2 // actually compressed, not wrapped

    an[Exception] should be thrownBy AudioCodec.samples(flac)

    val d = FlacCodec.decode(flac)
    d.sampleRate shouldBe 8000
    d.bitsPerSample shouldBe 16
    d.samples.length shouldBe 1
    d.samples.head.toSeq shouldBe pcm.toSeq
  }

  test("every subframe type round-trips bit-exactly") {
    val pcm = tone(600)
    for (mode <- Seq("fixed", "verbatim", "lpc")) {
      val flac = FlacEncoder.encode(Array(pcm), rate = 8000, mode = mode)
      FlacCodec.decode(flac).samples.head.toSeq shouldBe pcm.toSeq
    }
    // a flat signal takes the CONSTANT subframe path
    val const = Array.fill(600)(1234)
    val flac = FlacEncoder.encode(Array(const), rate = 8000)
    flac.length should be < 200 // constant frames are a few bytes each
    FlacCodec.decode(flac).samples.head.toSeq shouldBe const.toSeq

    // full-scale noise makes raw escape cheaper than any Rice parameter
    // (zigzagged ±32767 residuals cost ≥ 18 bits under p = 14 vs 16 raw),
    // so this exercises the decoder's escape arm
    val rnd = new scala.util.Random(3)
    val noise = Array.fill(600)(rnd.nextInt(65536) - 32768)
    val nf = FlacEncoder.encode(Array(noise), rate = 8000)
    FlacCodec.decode(nf).samples.head.toSeq shouldBe noise.toSeq
  }

  test("stereo round-trips: independent and all three joint-coding modes") {
    val left = tone(700, hz = 330)
    val right = tone(700, hz = 550, amp = 0.3)
    for (stereo <- Seq("independent", "leftSide", "rightSide", "midSide")) {
      withClue(stereo) {
        val flac = FlacEncoder.encode(Array(left, right), rate = 8000,
          stereoMode = stereo)
        val d = FlacCodec.decode(flac)
        d.samples.length shouldBe 2
        d.samples(0).toSeq shouldBe left.toSeq
        d.samples(1).toSeq shouldBe right.toSeq
      }
    }
  }

  test("wasted bits round-trip: shared trailing zeros move to the header") {
    // every sample a multiple of 16 → 4 wasted bits in each subframe
    val pcm = tone(600).map(v => (v >> 4) << 4)
    for (mode <- Seq("fixed", "verbatim", "lpc")) {
      val flac = FlacEncoder.encode(Array(pcm), rate = 8000, mode = mode)
      FlacCodec.decode(flac).samples.head.toSeq shouldBe pcm.toSeq
    }
  }

  test("fuzz: every single-bit corruption of frame bytes is rejected") {
    val flac = FlacEncoder.encode(Array(tone(400)), rate = 8000)
    val rnd = new scala.util.Random(7)
    var rejected = 0
    (0 until 200).foreach { _ =>
      val c = flac.clone()
      val at = 42 + rnd.nextInt(c.length - 42) // past metadata
      c(at) = (c(at) ^ (1 << rnd.nextInt(8))).toByte
      val failed =
        try { FlacCodec.decode(c); false }
        catch { case _: Exception => true }
      if (failed) rejected += 1
    }
    // CRC-8/CRC-16 catch essentially everything; a flip in the final
    // frame's own CRC-16 field still fails that frame's check
    rejected shouldBe 200
  }

  test("multi-byte UTF-8 frame numbers decode (≥ 128 frames)") {
    val pcm = tone(6400) // blockSize 32 → 200 frames, numbers cross 0x80
    val flac = FlacEncoder.encode(Array(pcm), rate = 8000, blockSize = 32)
    FlacCodec.decode(flac).samples.head.toSeq shouldBe pcm.toSeq
  }

  test("corruption is a decode error, not noise (both CRCs checked)") {
    val flac = FlacEncoder.encode(Array(tone(1000)), rate = 8000)
    // flip one bit in the frame region (past the 4+4+34-byte metadata)
    val corrupt = flac.clone()
    corrupt(60) = (corrupt(60) ^ 0x10).toByte
    an[IllegalArgumentException] should be thrownBy FlacCodec.decode(corrupt)
    an[Exception] should be thrownBy
      FlacCodec.decode(java.util.Arrays.copyOf(flac, flac.length - 3))
    an[IllegalArgumentException] should be thrownBy
      FlacCodec.decode("not a flac file".getBytes)
  }

  test("lossless identity: FLAC re-encode has IDENTICAL features and phash") {
    val wav = AudioCodec.synthTone(hz = 440, ms = 200, amplitude = 0.4)
    val s = AudioCodec.samples(wav)
    // normalized samples came from 16-bit ints, so ×32768 recovers exactly
    val ints = s.map(v => math.round(v * 32768.0).toInt)
    val flac = FlacEncoder.encode(Array(ints), rate = 8000)

    // sample-space identity — not "close", equal
    FlacCodec.samples(flac).toSeq shouldBe s.toSeq
    AudioCodec.featuresOf(FlacCodec.samples(flac)).toSeq shouldBe
      AudioCodec.features(wav).toSeq

    // and the pipeline dispatch routes codec = "flac" through the arm
    import spark.implicits._
    val asset = BinaryPipeline.MediaAsset(1L, "audio", 0, 0, 200L, "flac", flac)
    val viaPipeline = BinaryPipeline
      .features(spark.createDataset(Seq(asset)), 8).collect().head.feature
    viaPipeline.toSeq shouldBe AudioCodec.features(wav).toSeq
  }

  test("perceptual dedup: FLAC re-encodes collide with PCM at hamming 0") {
    import spark.implicits._
    val base = BinaryPipeline.syntheticAssets(spark, 21)
      .filter(_.kind == "audio")
    val reencRows = base.collect().map { a =>
      val ints = AudioCodec.samples(a.data).map(v => math.round(v * 32768.0).toInt)
      a.copy(assetId = a.assetId + 1000, codec = "flac",
        data = FlacEncoder.encode(Array(ints), rate = 8000))
    }.toSeq
    val union = base.union(spark.createDataset(reencRows)).cache()
    val pairs = BinaryPipeline.phashDedup(union, maxHam = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.length shouldBe base.count()
    pairs.foreach { case (i, j, ham) => j shouldBe i + 1000; ham shouldBe 0L }
  }
}

/** Spec-side FLAC encoder: STREAMINFO + byte-aligned frames with real
  * CRC-8/CRC-16, CONSTANT / VERBATIM / FIXED / LPC subframes and
  * Rice-coded residuals (partition order 0, optimal parameter, raw
  * escape). Mono or stereo (independent or left/side joint coding).
  * Builds genuinely compressed fixtures so [[FlacCodec]] is tested
  * against content it did not produce.
  */
private[multimodal] object FlacEncoder {

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0

    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nb += 1
      if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
    }

    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1).toInt); i -= 1 }
    }

    def writeSigned(v: Int, n: Int): Unit =
      writeBits(v.toLong & ((1L << n) - 1), n)

    def align(): Unit = while (nb != 0) writeBit(0)

    /** Valid only at byte alignment. */
    def bytesSoFar: Array[Byte] = {
      require(nb == 0, "unaligned")
      buf.toByteArray
    }
  }

  def encode(channels: Array[Array[Int]], rate: Int, blockSize: Int = 192,
      mode: String = "fixed", stereoMode: String = "independent"): Array[Byte] = {
    require(channels.nonEmpty && channels.forall(_.length == channels.head.length))
    val n = channels.head.length
    val bps = 16

    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO, marked last metadata block
    val si = new BitWriter
    si.writeBits(0x80L, 8); si.writeBits(34L, 24)
    si.writeBits(blockSize.toLong, 16); si.writeBits(blockSize.toLong, 16)
    si.writeBits(0L, 24); si.writeBits(0L, 24) // frame sizes unknown
    si.writeBits(rate.toLong, 20)
    si.writeBits((channels.length - 1).toLong, 3)
    si.writeBits((bps - 1).toLong, 5)
    si.writeBits(n.toLong, 36)
    (0 until 16).foreach(_ => si.writeBits(0L, 8)) // MD5 unknown
    out.write(si.bytesSoFar)

    var pos = 0
    var frameNo = 0L
    while (pos < n) {
      val bs = math.min(blockSize, n - pos)
      val w = new BitWriter
      w.writeBits(0x3ffeL, 14) // sync
      w.writeBit(0) // reserved
      w.writeBit(0) // fixed blocking strategy
      w.writeBits(if (bs <= 256) 6L else 7L, 4) // explicit block size follows
      w.writeBits(0L, 4) // sample rate from STREAMINFO
      val chanAsgn =
        if (channels.length == 2) stereoMode match {
          case "leftSide" => 8
          case "rightSide" => 9
          case "midSide" => 10
          case _ => 1
        } else channels.length - 1
      w.writeBits(chanAsgn.toLong, 4)
      w.writeBits(4L, 3) // 16-bit samples
      w.writeBit(0) // reserved
      writeUtf8Number(w, frameNo)
      if (bs <= 256) w.writeBits((bs - 1).toLong, 8)
      else w.writeBits((bs - 1).toLong, 16)
      val header = w.bytesSoFar
      w.writeBits(FlacCodec.crc8(header, 0, header.length).toLong, 8)

      if (chanAsgn >= 8) { // joint stereo; the side channel gets +1 bit
        val l = channels(0).slice(pos, pos + bs)
        val r = channels(1).slice(pos, pos + bs)
        val side = Array.tabulate(bs)(i => l(i) - r(i))
        chanAsgn match {
          case 8 => // left/side
            writeSubframe(w, l, bps, mode)
            writeSubframe(w, side, bps + 1, mode)
          case 9 => // right/side (side stored FIRST)
            writeSubframe(w, side, bps + 1, mode)
            writeSubframe(w, r, bps, mode)
          case _ => // mid/side: mid = (l+r)>>1, parity rides in side's lsb
            val mid = Array.tabulate(bs)(i => (l(i) + r(i)) >> 1)
            writeSubframe(w, mid, bps, mode)
            writeSubframe(w, side, bps + 1, mode)
        }
      } else {
        channels.foreach(c => writeSubframe(w, c.slice(pos, pos + bs), bps, mode))
      }

      w.align()
      val body = w.bytesSoFar
      w.writeBits(FlacCodec.crc16(body, 0, body.length).toLong, 16)
      out.write(w.bytesSoFar)
      pos += bs
      frameNo += 1
    }
    out.toByteArray
  }

  private def writeUtf8Number(w: BitWriter, v: Long): Unit =
    if (v < 0x80) w.writeBits(v, 8)
    else {
      require(v < 0x800, "spec encoder: frame number too large")
      w.writeBits(0xc0L | (v >> 6), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    }

  private def writeSubframe(w: BitWriter, s0: Array[Int], bps0: Int,
      mode: String): Unit = {
    w.writeBit(0) // padding
    // wasted bits: shared trailing zeros move into the subframe header
    val wasted =
      if (s0.forall(_ == 0)) 0
      else math.min(bps0 - 1,
        s0.map(v => if (v == 0) bps0 else Integer.numberOfTrailingZeros(v)).min)
    val s = if (wasted == 0) s0 else s0.map(_ >> wasted)
    val bps = bps0 - wasted
    def writeType(t: Long): Unit = {
      w.writeBits(t, 6)
      if (wasted == 0) w.writeBit(0)
      else { // flag, then unary-coded wasted−1
        w.writeBit(1)
        (1 until wasted).foreach(_ => w.writeBit(0))
        w.writeBit(1)
      }
    }
    if (s.forall(_ == s.head)) {
      writeType(0L) // CONSTANT
      w.writeSigned(s.head, bps)
    } else if (mode == "verbatim") {
      writeType(1L)
      s.foreach(v => w.writeSigned(v, bps))
    } else if (mode == "lpc") {
      // order-2 LPC, coefficients (5, -3), shift 1, 4-bit precision:
      // pred(i) = (5·s(i−1) − 3·s(i−2)) >> 1
      val order = 2
      writeType((0x20 | (order - 1)).toLong)
      s.take(order).foreach(v => w.writeSigned(v, bps))
      w.writeBits(3L, 4) // precision − 1
      w.writeSigned(1, 5) // shift
      w.writeSigned(5, 4); w.writeSigned(-3, 4)
      val res = Array.tabulate(s.length - order) { k =>
        val i = k + order
        s(i) - ((5L * s(i - 1) - 3L * s(i - 2)) >> 1).toInt
      }
      writeResidual(w, res)
    } else {
      // FIXED: pick the best of orders 0–2 by total residual magnitude
      val cands = (0 to 2).map { o =>
        val res = Array.tabulate(s.length - o) { k =>
          val i = k + o
          o match {
            case 0 => s(i)
            case 1 => s(i) - s(i - 1)
            case _ => s(i) - 2 * s(i - 1) + s(i - 2)
          }
        }
        (o, res)
      }
      val (order, res) = cands.minBy(_._2.map(r => math.abs(r.toLong)).sum)
      writeType((0x08 | order).toLong)
      s.take(order).foreach(v => w.writeSigned(v, bps))
      writeResidual(w, res)
    }
  }

  /** Rice residual, method 0, partition order 0: best 4-bit parameter by
    * exact bit cost, with the raw-bits escape when that is cheaper.
    */
  private def writeResidual(w: BitWriter, res: Array[Int]): Unit = {
    w.writeBits(0L, 2) // method 0 (4-bit rice parameters)
    w.writeBits(0L, 4) // partition order 0
    val zz = res.map(v => (v << 1) ^ (v >> 31))
    val (bestP, bestCost) = (0 to 14).map { p =>
      p -> zz.map(z => ((z >>> p) + 1 + p).toLong).sum
    }.minBy(_._2)
    val rawBits =
      if (res.isEmpty) 0
      else math.max(1, 33 - Integer.numberOfLeadingZeros(
        res.map(v => math.max(math.abs(v) - (if (v < 0) 1 else 0), 0)).max))
    if (res.nonEmpty && 5 + res.length.toLong * rawBits < bestCost) {
      w.writeBits(15L, 4) // escape
      w.writeBits(rawBits.toLong, 5)
      res.foreach(v => w.writeSigned(v, rawBits))
    } else {
      w.writeBits(bestP.toLong, 4)
      zz.foreach { z =>
        var q = z >>> bestP
        while (q > 0) { w.writeBit(0); q -= 1 }
        w.writeBit(1)
        w.writeBits((z & ((1 << bestP) - 1)).toLong, bestP)
      }
    }
  }
}
