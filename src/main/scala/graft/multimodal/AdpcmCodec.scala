package graft.multimodal

/** REAL non-JDK audio codec: IMA ADPCM (DVI4) WAV decode, pure JVM.
  * The JDK's `javax.sound.sampled` reads only PCM / µ-law / A-law WAV
  * (format tags 1, 6, 7) and throws on ADPCM (tag 0x11), so this is a
  * genuine external-codec arm for [[BinaryPipeline]]'s dispatch — the
  * 4:1-compressed WAV variant ubiquitous in telephony/game assets.
  *
  * Format (mono): RIFF/WAVE with `fmt ` tag 0x11 and block-aligned
  * `data`. Each block starts with a 4-byte header — initial predictor
  * (int16 LE, emitted as the block's first sample), step-table index
  * (uint8), reserved byte — followed by 4-bit nibbles, low nibble
  * first. Each nibble expands via the standard IMA step/index tables:
  * diff = (step>>3) + Σ selected step shifts, sign bit 8 negates,
  * predictor clamps to int16, index moves by indexTable[nibble] and
  * clamps to [0, 88].
  *
  * Decodes to the same normalized-double sample space as
  * [[AudioCodec.samples]], so [[AudioCodec.featuresOf]] puts ADPCM
  * content into the identical feature space as PCM content — the
  * property that lets a re-compressed clip dedup against its PCM
  * original (spec-asserted in BinaryPipelineSpec).
  */
object AdpcmCodec {

  private val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val indexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def s16(b: Array[Byte], o: Int): Int = u16(b, o).toShort.toInt

  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong | (u16(b, o + 2).toLong << 16)) & 0xffffffffL

  /** One nibble through the IMA state machine.
    * @return (new predictor, new index)
    */
  private def step(nibble: Int, pred: Int, index: Int): (Int, Int) = {
    val st = stepTable(index)
    var diff = st >> 3
    if ((nibble & 1) != 0) diff += st >> 2
    if ((nibble & 2) != 0) diff += st >> 1
    if ((nibble & 4) != 0) diff += st
    if ((nibble & 8) != 0) diff = -diff
    val p = math.max(-32768, math.min(32767, pred + diff))
    val i = math.max(0, math.min(88, index + indexTable(nibble)))
    (p, i)
  }

  /** Decode a mono IMA-ADPCM WAV payload to normalized samples in
    * [-1, 1] (the [[AudioCodec.samples]] space).
    */
  def samples(bytes: Array[Byte]): Array[Double] = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      "not a RIFF/WAVE payload")
    // chunk walk: locate fmt + data
    var off = 12
    var blockAlign = 0
    var channels = 0
    var tag = 0
    var dataOff = -1
    var dataLen = 0
    var factSamples = -1L
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = u32(bytes, off + 4).toInt
      if (id == "fmt ") {
        tag = u16(bytes, off + 8)
        channels = u16(bytes, off + 10)
        blockAlign = u16(bytes, off + 20)
      } else if (id == "fact") {
        // mandatory for compressed WAV: the TRUE sample count, so the
        // final partial block's padding is dropped on decode
        factSamples = u32(bytes, off + 8)
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = math.min(len, bytes.length - dataOff)
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(tag == 0x11, f"not IMA ADPCM: wFormatTag=0x$tag%x")
    require(channels == 1, s"mono only, got $channels channels")
    require(blockAlign >= 5, s"implausible blockAlign $blockAlign")
    require(dataOff >= 0, "no data chunk")

    val samplesPerBlock = (blockAlign - 4) * 2 + 1
    val nBlocks = dataLen / blockAlign
    val out = new Array[Double](nBlocks * samplesPerBlock)
    var w = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = dataOff + blk * blockAlign
      var pred = s16(bytes, base)
      var index = math.max(0, math.min(88, bytes(base + 2) & 0xff))
      out(w) = pred / 32768.0
      w += 1
      var i = 4
      while (i < blockAlign) {
        val b = bytes(base + i) & 0xff
        val (p1, i1) = step(b & 0xf, pred, index)
        pred = p1; index = i1
        out(w) = pred / 32768.0
        w += 1
        val (p2, i2) = step(b >> 4, pred, index)
        pred = p2; index = i2
        out(w) = pred / 32768.0
        w += 1
        i += 1
      }
      blk += 1
    }
    if (factSamples >= 0 && factSamples < out.length)
      java.util.Arrays.copyOf(out, factSamples.toInt)
    else out
  }
}
