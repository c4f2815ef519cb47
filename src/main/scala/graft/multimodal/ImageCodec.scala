package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec over the JDK's built-in `javax.imageio` readers
  * (PNG/BMP/GIF/JPEG — no external libraries): decode, bilinear resize,
  * tile-luminance features, and a 64-bit average-hash (aHash — the
  * resize-to-8×8/threshold-by-mean construction from the perceptual
  * hashing literature). Pure functions of the payload bytes, so features
  * and hashes are deterministic and two encodings of the SAME pixels
  * (e.g. PNG vs BMP) produce identical outputs — which is exactly what
  * perceptual dedup needs and byte-level dedup cannot see.
  *
  * Used by [[BinaryPipeline]] for `kind = "image"` rows; audio/video
  * stay on [[BinaryPipeline.StubDecoder]] (the JDK ships no audio/video
  * codecs — that remains the one disclosed stub).
  */
object ImageCodec {

  /** Tile grid for the feature vector: tiles×tiles mean luminances. */
  val tiles = 4
  val dim: Int = tiles * tiles

  // ImageIO's default disk-backed stream cache buys nothing for
  // in-memory byte arrays and churns executor tmp dirs
  ImageIO.setUseCache(false)

  def read(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    img
  }

  def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  private def luminance(rgb: Int): Double = {
    val r = (rgb >> 16) & 0xff
    val gr = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    0.299 * r + 0.587 * gr + 0.114 * b
  }

  /** Feature vector: resize to the tile grid, one mean-luminance float
    * in [0,1] per tile, row-major.
    */
  def features(bytes: Array[Byte]): Array[Float] = featuresOf(read(bytes))

  /** [[features]] over an already-decoded image (video frame path). */
  def featuresOf(img: BufferedImage): Array[Float] = {
    val small = resize(img, tiles, tiles)
    val out = new Array[Float](dim)
    var y = 0
    var i = 0
    while (y < tiles) {
      var x = 0
      while (x < tiles) {
        out(i) = (luminance(small.getRGB(x, y)) / 255.0).toFloat
        i += 1; x += 1
      }
      y += 1
    }
    out
  }

  /** Frame-style decode at a target size: resize then tile features —
    * the real path MM2 uses for decodable payloads.
    */
  def featuresAt(bytes: Array[Byte], w: Int, h: Int): Array[Float] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(resize(read(bytes), w, h), "png", out)
    features(out.toByteArray)
  }

  /** 64-bit average-hash: 8×8 grayscale, bit i set iff that cell's
    * luminance exceeds the 64-cell mean. Hamming distance between
    * aHashes tracks visual difference, so [[graft.operators.HammingNearDup]]
    * blocks/verifies it exactly like text SimHash.
    */
  def aHash64(bytes: Array[Byte]): Long = aHash64Of(read(bytes))

  /** [[aHash64]] over an already-decoded image (video frame path). */
  def aHash64Of(img: BufferedImage): Long = {
    val small = resize(img, 8, 8)
    val lum = new Array[Double](64)
    var i = 0
    var sum = 0.0
    while (i < 64) {
      lum(i) = luminance(small.getRGB(i % 8, i / 8))
      sum += lum(i); i += 1
    }
    val mean = sum / 64.0
    var h = 0L
    i = 0
    while (i < 64) {
      if (lum(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  def encode(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"no ImageIO writer for $format")
    out.toByteArray
  }
}
