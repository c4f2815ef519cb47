package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** REAL video container codec for MJPEG-in-AVI, JDK-only: an AVI file is
  * RIFF chunks, and a Motion-JPEG stream's `00dc`/`00db` chunks are
  * plain JPEG images `javax.imageio` can decode. The parser walks the
  * RIFF structure (any spec-conforming MJPEG AVI — not just files this
  * writer produced); the writer emits a minimal spec-shaped AVI
  * (`hdrl` with avih/strh/strf, `movi` with one `00dc` chunk per
  * frame). Codecs that need entropy decoders outside the JDK (H.264,
  * VP9, …) remain on the disclosed stub — the dispatch in
  * [[BinaryPipeline]] keys on the asset's `codec` field.
  *
  * Format reference: the public AVI RIFF specification (fourcc chunks,
  * u32 little-endian sizes, even-byte chunk padding).
  */
object AviCodec {

  // ----------------------------------------------------------- parsing

  /** Extract the video frames of stream 0 (`00dc`/`00db` chunks, each a
    * JPEG for MJPEG streams) in file order.
    */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
      fourcc(bytes, 8) == "AVI ", "payload is not a RIFF/AVI container")
    val out = Seq.newBuilder[Array[Byte]]
    def walk(from: Int, until: Int): Unit = {
      var p = from
      while (p + 8 <= until) {
        val id = fourcc(bytes, p)
        // clamp malformed/truncated sizes instead of running off the end
        val size = math.max(0, math.min(u32(bytes, p + 4), until - p - 8))
        val dataStart = p + 8
        if (id == "RIFF" || id == "LIST") {
          // list body = fourcc + sub-chunks
          walk(dataStart + 4, dataStart + size)
        } else if (id == "00dc" || id == "00db") {
          out += java.util.Arrays.copyOfRange(bytes, dataStart,
            dataStart + size)
        }
        p = dataStart + size + (size & 1) // chunks pad to even
      }
    }
    walk(12, bytes.length)
    out.result()
  }

  /** Decode frame `idx` to pixels (MJPEG ⇒ each frame is a JPEG). */
  def decodeFrame(bytes: Array[Byte], idx: Int): BufferedImage = {
    val fs = frames(bytes)
    require(fs.nonEmpty, "AVI contains no video frame chunks")
    ImageCodec.read(fs(math.min(math.max(idx, 0), fs.size - 1)))
  }

  // ----------------------------------------------------------- writing

  /** Minimal spec-shaped MJPEG AVI: RIFF(AVI ) { LIST(hdrl){ avih,
    * LIST(strl){ strh, strf } }, LIST(movi){ 00dc* } }.
    */
  def write(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int): Array[Byte] = {
    require(jpegFrames.nonEmpty, "an AVI needs at least one frame")
    val avih = chunk("avih", le(
      1000000 / fps, 0, 0, 0x10, jpegFrames.size, 0, 1, 0, width, height,
      0, 0, 0, 0))
    val strh = chunk("strh", bytes("vids") ++ bytes("MJPG") ++ le(
      0, 0, 0, 0) ++ le16(0, 0) ++ le(1, fps, 0, jpegFrames.size, 0, -1, 0) ++
      le16(0, 0, width, height))
    // strf = BITMAPINFOHEADER
    val strf = chunk("strf", le(40, width, height) ++ le16(1, 24) ++
      bytes("MJPG") ++ le(width * height * 3, 0, 0, 0, 0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      jpegFrames.flatMap(f => chunk("00dc", f)).toArray)
    val body = bytes("AVI ") ++ hdrl ++ movi
    bytes("RIFF") ++ le(body.length) ++ body
  }

  /** JPEG-encode an image (the MJPEG frame payload). */
  def jpeg(img: BufferedImage): Array[Byte] = ImageCodec.encode(img, "jpg")

  // ----------------------------------------------------------- helpers

  private def fourcc(b: Array[Byte], at: Int): String =
    new String(b, at, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32(b: Array[Byte], at: Int): Int =
    ByteBuffer.wrap(b, at, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def le(vs: Int*): Array[Byte] = {
    val bb = ByteBuffer.allocate(vs.size * 4).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putInt)
    bb.array()
  }

  private def le16(vs: Int*): Array[Byte] = {
    val bb = ByteBuffer.allocate(vs.size * 2).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    bytes(id) ++ le(data.length) ++ data ++ pad
  }

  private def list(kind: String, data: Array[Byte]): Array[Byte] =
    chunk("LIST", bytes(kind) ++ data)
}
