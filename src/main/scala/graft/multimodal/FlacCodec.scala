package graft.multimodal

/** REAL non-JDK audio codec: FLAC decode, pure JVM. The JDK's
  * `javax.sound.sampled` has no FLAC service provider and throws on the
  * `fLaC` magic, so — like [[AdpcmCodec]] — this is a genuine external
  * codec arm for [[BinaryPipeline]]'s `codec` dispatch. FLAC is the
  * dominant lossless format in public speech corpora (LibriSpeech,
  * MLS), which makes it the arm a real training-data pipeline needs
  * first.
  *
  * Because FLAC is LOSSLESS the verification contract is stronger than
  * ADPCM's: decode(encode(pcm)) must be bit-exact, and a FLAC
  * re-encoding of a MONO PCM clip must land on the IDENTICAL feature
  * vector and perceptual hash (asserted in FlacCodecSpec — hamming
  * distance 0, not "small"). Multi-channel decode is bit-exact per
  * channel; the mono DOWNMIX in [[samples]] is a deterministic float
  * average, which need not bit-match the JDK's own stereo-to-mono
  * conversion — so the cross-codec identity contract is scoped to mono
  * (what speech corpora are).
  *
  * Format (public spec, IETF RFC 9639 / xiph.org): `fLaC` magic;
  * metadata blocks (STREAMINFO holds rate/channels/bps/total-samples);
  * then byte-aligned frames. Each frame: 14-bit sync, block-size /
  * sample-rate / channel-assignment / sample-size codes, UTF-8-coded
  * frame number, CRC-8 over the header; per-channel subframes
  * (CONSTANT | VERBATIM | FIXED order 0–4 | LPC order 1–32) whose
  * residuals are Rice-coded in 2^order partitions (with a raw-bits
  * escape); CRC-16 over the whole frame. Stereo may be jointly coded
  * (left/side, right/side, mid/side; the side channel carries one
  * extra bit). This decoder implements all of it for 4–32 bps and
  * checks both CRCs — a flipped bit is a decode error, not noise.
  */
object FlacCodec {

  /** MSB-first bit cursor over the payload. Decode is mapPartitions
    * work over one asset at a time, so a simple per-bit loop is fine —
    * this is not a query hot path.
    */
  private final class BitReader(b: Array[Byte]) {
    var bitPos: Long = 0L

    def bytePos: Int = (bitPos >>> 3).toInt

    def readBit(): Int = {
      val p = bitPos
      require(p < b.length.toLong * 8, "FLAC: truncated payload")
      bitPos = p + 1
      (b((p >>> 3).toInt) >> (7 - (p & 7)).toInt) & 1
    }

    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readBitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** n-bit two's-complement signed read (n ≤ 32). */
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      if (n == 0 || n == 32) v
      else if ((v & (1 << (n - 1))) != 0) v - (1 << n)
      else v
    }

    /** n-bit two's-complement signed read into a Long (n ≤ 63) — the
      * sample read: a 32-bps side channel is 33 bits wide.
      */
    def readSignedLong(n: Int): Long = {
      val v = readBitsLong(n)
      if (n == 0) v
      else if ((v & (1L << (n - 1))) != 0) v - (1L << n)
      else v
    }

    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }

    def alignByte(): Unit = bitPos = (bitPos + 7) & ~7L

    /** FLAC's extended UTF-8 number (frame/sample index, up to 36 bits). */
    def readUtf8Number(): Long = {
      val first = readBits(8)
      if (first < 0x80) first.toLong
      else {
        var ones = 0
        while (ones < 8 && (first & (0x80 >> ones)) != 0) ones += 1
        require(ones >= 2 && ones <= 7, s"FLAC: bad UTF-8 lead byte $first")
        var v = (first & (0x7f >> ones)).toLong
        var i = 1
        while (i < ones) {
          val c = readBits(8)
          require((c & 0xc0) == 0x80, "FLAC: bad UTF-8 continuation")
          v = (v << 6) | (c & 0x3f)
          i += 1
        }
        v
      }
    }
  }

  /** CRC-8, poly 0x07, init 0 — the frame-header checksum. */
  private[multimodal] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — the whole-frame checksum. */
  private[multimodal] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc =
          if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  private val blockSizeTable: Array[Int] = Array(
    -1, 192, 576, 1152, 2304, 4608, -8 /* 8-bit follows */ ,
    -16 /* 16-bit follows */ , 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)

  private val sampleRateTable: Array[Int] = Array(
    0 /* streaminfo */ , 88200, 176400, 192000, 8000, 16000, 22050, 24000,
    32000, 44100, 48000, 96000, -8 /* kHz byte */ , -16 /* Hz */ ,
    -160 /* Hz/10 */ , -1)

  private val sampleSizeTable: Array[Int] =
    Array(0 /* streaminfo */ , 8, 12, -1, 16, 20, 24, 32)

  final case class Decoded(samples: Array[Array[Int]], sampleRate: Int,
      bitsPerSample: Int)

  /** Decode a FLAC payload to per-channel integer PCM. Both CRCs are
    * verified per frame.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length > 42 &&
      bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C',
      "not a FLAC payload")

    // ------------------------------------------------- metadata blocks
    var off = 4
    var siRate = 0
    var siChannels = 0
    var siBps = 0
    var siTotal = 0L
    var sawStreamInfo = false
    var last = false
    while (!last) {
      require(off + 4 <= bytes.length, "FLAC: truncated metadata")
      val head = bytes(off) & 0xff
      last = (head & 0x80) != 0
      val btype = head & 0x7f
      val len = ((bytes(off + 1) & 0xff) << 16) | ((bytes(off + 2) & 0xff) << 8) |
        (bytes(off + 3) & 0xff)
      if (btype == 0) { // STREAMINFO
        require(len == 34, s"FLAC: STREAMINFO length $len")
        val r = new BitReader(bytes)
        r.bitPos = (off + 4).toLong * 8
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        siRate = r.readBits(20)
        siChannels = r.readBits(3) + 1
        siBps = r.readBits(5) + 1
        siTotal = r.readBitsLong(36)
        sawStreamInfo = true
      }
      off += 4 + len
    }
    require(sawStreamInfo, "FLAC: no STREAMINFO block")
    require(siRate > 0, "FLAC: sample rate 0")

    // ------------------------------------------------------- frames
    val out = Array.fill(siChannels)(new java.util.ArrayList[Int]())
    val r = new BitReader(bytes)
    r.bitPos = off.toLong * 8
    var decoded = 0L
    while ((siTotal == 0L || decoded < siTotal) && r.bytePos + 2 <= bytes.length) {
      val frameStart = r.bytePos
      val sync = r.readBits(14)
      require(sync == 0x3ffe, f"FLAC: lost frame sync at byte $frameStart (0x$sync%x)")
      require(r.readBit() == 0, "FLAC: reserved bit set")
      r.readBit() // blocking strategy (frame- vs sample-number keyed)
      val bsCode = r.readBits(4)
      val srCode = r.readBits(4)
      val chanAsgn = r.readBits(4)
      val ssCode = r.readBits(3)
      require(r.readBit() == 0, "FLAC: reserved bit set")
      r.readUtf8Number()
      val blockSize = blockSizeTable(bsCode) match {
        case -8 => r.readBits(8) + 1
        case -16 => r.readBits(16) + 1
        case -1 => throw new IllegalArgumentException("FLAC: reserved block size")
        case v => v
      }
      sampleRateTable(srCode) match {
        case -8 => r.readBits(8) // kHz — informational; STREAMINFO governs
        case -16 => r.readBits(16)
        case -160 => r.readBits(16)
        case -1 => throw new IllegalArgumentException("FLAC: bad sample-rate code")
        case _ => ()
      }
      val bps = sampleSizeTable(ssCode) match {
        case 0 => siBps
        case -1 => throw new IllegalArgumentException("FLAC: reserved sample size")
        case v => v
      }
      val headerEnd = r.bytePos
      val hCrc = r.readBits(8)
      require(hCrc == crc8(bytes, frameStart, headerEnd),
        "FLAC: frame header CRC-8 mismatch")

      val (nCh, sideMode) = chanAsgn match {
        case a if a <= 7 => (a + 1, -1)
        case 8 => (2, 0) // left/side
        case 9 => (2, 1) // right/side
        case 10 => (2, 2) // mid/side
        case a => throw new IllegalArgumentException(s"FLAC: channel assignment $a")
      }
      require(nCh == siChannels,
        s"FLAC: frame channels $nCh != STREAMINFO $siChannels")

      val chans = Array.tabulate(nCh) { c =>
        // the side (difference) channel carries one extra bit
        val extra = sideMode match {
          case 0 | 2 if c == 1 => 1
          case 1 if c == 0 => 1
          case _ => 0
        }
        readSubframe(r, blockSize, bps + extra)
      }
      sideMode match {
        case 0 => // left/side: right = left - side
          var i = 0
          while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
        case 1 => // right/side: left = right + side
          var i = 0
          while (i < blockSize) { chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
        case 2 => // mid/side
          var i = 0
          while (i < blockSize) {
            val side = chans(1)(i)
            val mid = (chans(0)(i) << 1) | (side & 1L)
            chans(0)(i) = (mid + side) >> 1
            chans(1)(i) = (mid - side) >> 1
            i += 1
          }
        case _ => ()
      }

      r.alignByte()
      val bodyEnd = r.bytePos
      val fCrc = r.readBits(16)
      require(fCrc == crc16(bytes, frameStart, bodyEnd),
        "FLAC: frame CRC-16 mismatch")

      var c = 0
      while (c < nCh) {
        var i = 0
        // reconstructed samples fit bps ≤ 32 bits — narrow after recon
        while (i < blockSize) { out(c).add(chans(c)(i).toInt); i += 1 }
        c += 1
      }
      decoded += blockSize
    }
    require(siTotal == 0L || decoded == siTotal,
      s"FLAC: decoded $decoded of $siTotal samples")

    val arrs = out.map { l =>
      val a = new Array[Int](l.size)
      var i = 0
      while (i < a.length) { a(i) = l.get(i); i += 1 }
      a
    }
    Decoded(arrs, siRate, siBps)
  }

  // --------------------------------------------------------- subframes

  /** Subframe samples decode into LONGS: a joint-stereo side channel at
    * 32 bps reads 33-bit values, and the fixed/LPC predictor arithmetic
    * on 32-bit samples overflows Int mid-computation — everything stays
    * 64-bit until the post-reconstruction narrowing in [[decode]].
    */
  private def readSubframe(r: BitReader, blockSize: Int, bps: Int): Array[Long] = {
    require(r.readBit() == 0, "FLAC: subframe padding bit set")
    val t = r.readBits(6)
    val wasted =
      if (r.readBit() == 1) r.readUnary() + 1
      else 0
    val eff = bps - wasted
    val s = new Array[Long](blockSize)
    if (t == 0) { // CONSTANT
      val v = r.readSignedLong(eff)
      java.util.Arrays.fill(s, v)
    } else if (t == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { s(i) = r.readSignedLong(eff); i += 1 }
    } else if ((t & 0x38) == 0x08 && (t & 0x07) <= 4) { // FIXED order 0–4
      val order = t & 0x07
      var i = 0
      while (i < order) { s(i) = r.readSignedLong(eff); i += 1 }
      readResidual(r, blockSize, order, s)
      restoreFixed(s, order, blockSize)
    } else if ((t & 0x20) != 0) { // LPC, order 1–32
      val order = (t & 0x1f) + 1
      var i = 0
      while (i < order) { s(i) = r.readSignedLong(eff); i += 1 }
      val precision = r.readBits(4) + 1
      require(precision < 16, "FLAC: invalid LPC precision")
      val shift = r.readSigned(5)
      require(shift >= 0, s"FLAC: negative LPC shift $shift")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
      readResidual(r, blockSize, order, s)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
        s(i) += (acc >> shift)
        i += 1
      }
    } else throw new IllegalArgumentException(f"FLAC: reserved subframe type 0x$t%x")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { s(i) = s(i) << wasted; i += 1 }
    }
    s
  }

  /** Rice-coded residual (coding methods 0/1, 2^order partitions, raw
    * escape) decoded IN PLACE into s(order until blockSize).
    */
  private def readResidual(r: BitReader, blockSize: Int, predOrder: Int,
      s: Array[Long]): Unit = {
    val method = r.readBits(2)
    require(method <= 1, s"FLAC: reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.readBits(4)
    val nParts = 1 << partOrder
    require(blockSize % nParts == 0, "FLAC: partition order does not divide block")
    var w = predOrder
    var p = 0
    while (p < nParts) {
      val count = (blockSize >> partOrder) - (if (p == 0) predOrder else 0)
      require(count >= 0, "FLAC: predictor order exceeds first partition")
      val param = r.readBits(paramBits)
      if (param == escape) {
        val raw = r.readBits(5)
        var i = 0
        while (i < count) { s(w) = r.readSignedLong(raw); w += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val v = (q.toLong << param) | r.readBits(param)
          s(w) = (v >>> 1) ^ -(v & 1L) // zigzag
          w += 1
          i += 1
        }
      }
      p += 1
    }
  }

  /** Fixed-predictor restoration, orders 0–4 (polynomial predictors). */
  private def restoreFixed(s: Array[Long], order: Int, n: Int): Unit = {
    var i = order
    order match {
      case 0 => ()
      case 1 => while (i < n) { s(i) += s(i - 1); i += 1 }
      case 2 => while (i < n) { s(i) += 2 * s(i - 1) - s(i - 2); i += 1 }
      case 3 =>
        while (i < n) { s(i) += 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3); i += 1 }
      case 4 =>
        while (i < n) {
          s(i) += 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
          i += 1
        }
      case o => throw new IllegalArgumentException(s"FLAC: fixed order $o")
    }
  }

  /** Decode to normalized mono samples in [-1, 1] (the
    * [[AudioCodec.samples]] space — channels averaged), so every audio
    * codec arm lands in the same feature space and cross-codec
    * perceptual dedup works. Lossless: a FLAC of 16-bit MONO PCM
    * reproduces [[AudioCodec.samples]] of the original WAV bit-for-bit;
    * for multi-channel input the per-channel decode is still bit-exact
    * but this float-average downmix is its own (deterministic)
    * convention, not a bit-match of the JDK converter's.
    */
  def samples(bytes: Array[Byte]): Array[Double] = {
    val d = decode(bytes)
    val n = d.samples.head.length
    val scale = (1L << (d.bitsPerSample - 1)).toDouble
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var acc = 0.0
      var c = 0
      while (c < d.samples.length) { acc += d.samples(c)(i); c += 1 }
      out(i) = acc / d.samples.length / scale
      i += 1
    }
    out
  }
}
