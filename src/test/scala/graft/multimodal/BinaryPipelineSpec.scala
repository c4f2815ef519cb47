package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import BinaryPipeline._

class BinaryPipelineSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("MM1 schema: binary payload + typed metadata columns") {
    val assets = syntheticAssets(spark, 30).toDF
    assets.schema("data").dataType shouldBe BinaryType
    assets.schema.fieldNames should contain allOf
      ("assetId", "kind", "width", "height", "durationMs", "codec")
    // metadata-only projection never touches the payload column
    metadataOnly(assets).schema.fieldNames should not contain "data"
    assets.filter(col("kind") === "video").count() shouldBe 10
  }

  test("MM1 batch decode: deterministic features, batch shape honored") {
    val assets = syntheticAssets(spark, 100).repartition(4)
    val acc = spark.sparkContext.longAccumulator("decodeBatches")
    val feats = features(assets, batchSize = 16, Some(acc)).cache()

    feats.count() shouldBe 100
    feats.collect().foreach(_.feature.length shouldBe StubDecoder.dim)
    // batches of ≤16 over 4 partitions of ~25 rows → ~2 batches each;
    // strictly fewer invocations than rows proves batching is real
    acc.value.longValue should be >= 4L
    acc.value.longValue should be < 100L

    // determinism: same input → bit-identical features
    val again = features(syntheticAssets(spark, 100).repartition(4), 16)
      .collect().map(f => f.assetId -> f.feature.toSeq).toMap
    feats.collect().foreach(f => again(f.assetId) shouldBe f.feature.toSeq)
  }

  test("MM2 frame sampling emits one row per sampled frame at target size") {
    val assets = syntheticAssets(spark, 30)
    val frames = sampleFrames(assets, frameEveryMs = 1000,
      resizeW = 32, resizeH = 24).cache()

    // only videos produce frames; durationMs/1000 frames each
    val expected = assets.collect().filter(_.kind == "video")
      .map(a => a.assetId -> (a.durationMs / 1000).toInt).toMap
    val byAsset = frames.collect().groupBy(_.assetId)
    byAsset.keySet shouldBe expected.keySet
    byAsset.foreach { case (id, fs) =>
      fs.length shouldBe expected(id)
      fs.map(_.frameIdx).sorted.toSeq shouldBe (0 until expected(id))
      fs.foreach { f => f.width shouldBe 32; f.height shouldBe 24 }
    }
    // frames of the same asset differ (salted by frame index)
    val multi = byAsset.values.find(_.length > 1).get
    multi.map(_.feature.toSeq).distinct.length shouldBe multi.length
  }

  test("MM3: phash dedup finds byte-identical assets, nothing else") {
    import spark.implicits._
    val base = BinaryPipeline.syntheticAssets(spark, 20)
    // re-upload the same payloads under new ids: exact perceptual dups
    val copies = base.map(a => a.copy(assetId = a.assetId + 1000))
    val pairs = BinaryPipeline
      .phashDedup(base.union(copies), maxHam = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val dupPairs = pairs.filter { case (i, j, _) => j == i + 1000 }
    dupPairs.length shouldBe 20
    dupPairs.foreach { case (_, _, ham) => ham shouldBe 0 }
    // distinct payloads hash far apart (avalanche): no cross pairs
    pairs.length shouldBe 20
  }

  test("MM1 real decode: image features come from actual pixels") {
    // white image → all tile luminances 1.0; black → 0.0 — values a
    // byte-hash stub could never produce on purpose
    val white = BinaryPipeline.syntheticImage(0, 64, 64)
    val g = white.createGraphics()
    g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 64, 64); g.dispose()
    val whiteF = ImageCodec.features(ImageCodec.encode(white, "png"))
    all(whiteF.toSeq) shouldBe 1.0f +- 0.01f

    // PNG and BMP encodings of the SAME pixels decode to identical
    // features and identical aHash — different bytes, same image
    val img = BinaryPipeline.syntheticImage(7, 96, 64)
    val png = ImageCodec.encode(img, "png")
    val bmp = ImageCodec.encode(img, "bmp")
    png.toSeq should not be bmp.toSeq
    ImageCodec.features(png).toSeq shouldBe ImageCodec.features(bmp).toSeq
    ImageCodec.aHash64(png) shouldBe ImageCodec.aHash64(bmp)
  }

  test("MM1 real audio decode: features come from actual PCM samples") {
    // pure-ish tone at amplitude a: every frame's RMS ≈ a·0.583 (sine +
    // quarter second-harmonic, /1.25), scaled ×2 in the feature — a
    // value a byte-hash stub could never produce on purpose
    val wav = AudioCodec.synthTone(hz = 440, ms = 200, amplitude = 0.4)
    val f = AudioCodec.features(wav)
    f.length shouldBe AudioCodec.dim
    val expectedRms = (2.0 * 0.4 * 0.583).toFloat
    (0 until AudioCodec.frames).foreach { i =>
      f(i) shouldBe expectedRms +- 0.03f
    }
    // ZCR tracks pitch: 2·hz/rate per sample, ×4 in the feature
    val expectedZcr = (4.0 * 2 * 440 / 8000).toFloat
    (AudioCodec.frames until AudioCodec.dim).foreach { i =>
      f(i) shouldBe expectedZcr +- 0.05f
    }

    // WAV and AU containers of the SAME samples decode to identical
    // features — different bytes, same audio
    val au = AudioCodec.synthTone(hz = 440, ms = 200, format = "au",
      amplitude = 0.4)
    wav.toSeq should not be au.toSeq
    AudioCodec.features(au).toSeq shouldBe f.toSeq
  }

  test("MM3 real audio pHash: re-containered PCM is a near-dup") {
    import spark.implicits._
    val base = BinaryPipeline.syntheticAssets(spark, 21)
      .filter(_.kind == "audio")
    // re-encode every tone as AU under a new id: bytes change, samples
    // don't — byte-level dedup misses these, perceptual catches
    // (driver-side map: rewrap is a spec helper, not a Spark closure)
    val reencRows = base.collect().map { a =>
      a.copy(assetId = a.assetId + 1000, codec = "pcm_s16be_au",
        data = rewrap(AudioCodec.samples(a.data)))
    }.toSeq
    val union = base.union(spark.createDataset(reencRows)).cache()
    val pairs = BinaryPipeline.phashDedup(union, maxHam = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = base.count()
    pairs.length shouldBe n
    pairs.foreach { case (i, j, ham) => j shouldBe i + 1000; ham shouldBe 0L }
  }

  test("MM1 non-JDK codec: IMA ADPCM WAV decodes real content") {
    // javax.sound cannot read format tag 0x11 — prove it, then prove
    // the pure-JVM arm can
    val pcmWav = AudioCodec.synthTone(hz = 440, ms = 200, amplitude = 0.4)
    val adpcm = encodeAdpcm(AudioCodec.samples(pcmWav))
    an[Exception] should be thrownBy AudioCodec.samples(adpcm)

    // decoded waveform tracks the original (ADPCM is lossy; the step
    // quantizer error on a smooth tone stays small)
    val orig = AudioCodec.samples(pcmWav)
    val dec = AdpcmCodec.samples(adpcm)
    dec.length shouldBe orig.length // fact chunk drops block padding
    val err = orig.indices.map(i => math.abs(dec(i) - orig(i)))
    err.sum / err.size should be < 0.01

    // same feature space as PCM → cross-codec perceptual dedup works
    val fPcm = AudioCodec.features(pcmWav)
    val fAdpcm = AudioCodec.featuresOf(dec)
    fPcm.indices.foreach { i => fAdpcm(i) shouldBe fPcm(i) +- 0.05f }

    // and the pipeline dispatch routes codec = "ima_adpcm" through it
    import spark.implicits._
    val asset = BinaryPipeline.MediaAsset(1L, "audio", 0, 0, 200L,
      "ima_adpcm", adpcm)
    val viaPipeline = features(spark.createDataset(Seq(asset)), 8)
      .collect().head.feature
    fPcm.indices.foreach { i => viaPipeline(i) shouldBe fPcm(i) +- 0.05f }
  }

  /** Spec-side IMA ADPCM mono encoder (the standard step/index state
    * machine inverse of [[AdpcmCodec]]): builds real compressed
    * fixtures so the decoder is tested against content it did not
    * produce. 505 samples per 256-byte block.
    */
  private def encodeAdpcm(s: Array[Double], blockAlign: Int = 256): Array[Byte] = {
    val stepTable = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
      41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
      190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
      724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
      2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
      6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
      16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
    val indexTable = Array(-1, -1, -1, -1, 2, 4, 6, 8,
      -1, -1, -1, -1, 2, 4, 6, 8)
    val pcm = s.map(v => math.max(-32768,
      math.min(32767, math.round(v * 32768))).toInt)
    val samplesPerBlock = (blockAlign - 4) * 2 + 1
    val nBlocks = (pcm.length + samplesPerBlock - 1) / samplesPerBlock
    val data = new java.io.ByteArrayOutputStream()
    var pos = 0
    var index = 0
    (0 until nBlocks).foreach { _ =>
      var pred = pcm(math.min(pos, pcm.length - 1))
      // block header: predictor (int16 LE), index, reserved
      data.write(pred & 0xff); data.write((pred >> 8) & 0xff)
      data.write(index); data.write(0)
      pos += 1
      var lowNibble = -1
      (0 until (blockAlign - 4) * 2).foreach { k =>
        val sample = pcm(math.min(pos + k, pcm.length - 1))
        val st = stepTable(index)
        var diff = sample - pred
        var nibble = if (diff < 0) { diff = -diff; 8 } else 0
        var d = st
        if (diff >= d) { nibble |= 4; diff -= d }
        d >>= 1
        if (diff >= d) { nibble |= 2; diff -= d }
        d >>= 1
        if (diff >= d) { nibble |= 1 }
        // reconstruct exactly as the decoder will
        var rec = st >> 3
        if ((nibble & 1) != 0) rec += st >> 2
        if ((nibble & 2) != 0) rec += st >> 1
        if ((nibble & 4) != 0) rec += st
        if ((nibble & 8) != 0) rec = -rec
        pred = math.max(-32768, math.min(32767, pred + rec))
        index = math.max(0, math.min(88, index + indexTable(nibble)))
        if (lowNibble < 0) lowNibble = nibble
        else { data.write(lowNibble | (nibble << 4)); lowNibble = -1 }
      }
      pos += (blockAlign - 4) * 2
    }
    val body = data.toByteArray
    // RIFF/WAVE wrapper: fmt (tag 0x11, mono, 8 kHz) + data
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII"))
    w32(4 + 8 + 20 + 8 + 4 + 8 + body.length)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(20)
    w16(0x11); w16(1); w32(8000)
    w32(8000 * blockAlign / samplesPerBlock) // nominal byte rate
    w16(blockAlign); w16(4) // bits per sample
    w16(2); w16(samplesPerBlock) // cbSize + samples per block
    out.write("fact".getBytes("US-ASCII")); w32(4); w32(pcm.length)
    out.write("data".getBytes("US-ASCII")); w32(body.length)
    out.write(body)
    out.toByteArray
  }

  /** 16-bit mono 8 kHz AU bytes carrying exactly these samples. */
  private def rewrap(s: Array[Double]): Array[Byte] = {
    val pcm = new Array[Byte](s.length * 2)
    s.indices.foreach { i =>
      val v = math.max(-32768, math.min(32767,
        math.round(s(i) * 32768))).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, s.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.AU, out)
    out.toByteArray
  }

  test("MM2 real video: MJPEG AVI round-trips through the RIFF parser") {
    // build a 3-frame MJPEG AVI and get the frames back in order
    val imgs = (0 until 3).map(f =>
      BinaryPipeline.syntheticImage(9000 + f, 64, 48))
    val avi = AviCodec.write(imgs.map(AviCodec.jpeg), 64, 48, fps = 4)
    val back = AviCodec.frames(avi)
    back.size shouldBe 3
    // JPEG is lossy but the black/white block pattern survives: the
    // decoded frame's features match the source image's within noise
    (0 until 3).foreach { f =>
      val dec = ImageCodec.featuresOf(AviCodec.decodeFrame(avi, f))
      val src = ImageCodec.featuresOf(imgs(f))
      dec.zip(src).foreach { case (a, b) =>
        a shouldBe b +- 0.05f
      }
    }
    // and the perceptual hash of each decoded frame equals the source's
    (0 until 3).foreach { f =>
      ImageCodec.aHash64Of(AviCodec.decodeFrame(avi, f)) shouldBe
        ImageCodec.aHash64Of(imgs(f))
    }
    // non-AVI payloads are rejected, not misparsed
    intercept[IllegalArgumentException] {
      AviCodec.frames("not a riff file at all".getBytes)
    }
  }

  test("MM2 real resize: featuresAt decodes at the target frame size") {
    val img = BinaryPipeline.syntheticImage(3, 128, 64)
    val bytes = ImageCodec.encode(img, "png")
    val f = ImageCodec.featuresAt(bytes, 32, 24)
    f.length shouldBe ImageCodec.dim
    // downsampled content still reflects the source pixels: resizing a
    // uniform image yields uniform tiles
    val flat = new java.awt.image.BufferedImage(128, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = flat.createGraphics()
    g.setColor(new java.awt.Color(200, 200, 200))
    g.fillRect(0, 0, 128, 64); g.dispose()
    val ff = ImageCodec.featuresAt(ImageCodec.encode(flat, "png"), 32, 24)
    all(ff.toSeq) shouldBe (200f / 255f) +- 0.02f
  }

  test("MM3 real pHash: a re-encoded image is a near-dup despite new bytes") {
    import spark.implicits._
    val base = BinaryPipeline.syntheticAssets(spark, 21)
      .filter(_.kind == "image")
    // re-encode every image as BMP under a new id: bytes change, pixels
    // don't — exact (byte-hash) dedup misses these, perceptual catches
    val reenc = base.map { a =>
      a.copy(assetId = a.assetId + 1000,
        data = ImageCodec.encode(ImageCodec.read(a.data), "bmp"),
        codec = "bmp")
    }
    val union = base.union(reenc).cache()
    union.map(a => new String(java.util.Arrays.copyOf(a.data, 2)))
      .distinct().count() shouldBe 2 // PNG + BMP magic: bytes really differ
    val pairs = BinaryPipeline.phashDedup(union, maxHam = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = base.count()
    pairs.length shouldBe n
    pairs.foreach { case (i, j, ham) => j shouldBe i + 1000; ham shouldBe 0L }
  }

  test("MM3: phash locality — few flipped feature bits move hamming a little") {
    // two signatures differing in one feature tile differ by at most
    // 64/dim bits; sanity of the blocking contract used downstream
    import spark.implicits._
    val a = BinaryPipeline.syntheticAssets(spark, 4)
    val hashes = BinaryPipeline.phashes(a).collect()
    hashes.map(_.phash).distinct.length shouldBe 4
  }
}
