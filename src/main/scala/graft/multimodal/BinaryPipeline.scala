package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Multimodal binary-column pipeline (SURVEY MM1–MM2).
  *
  * Media assets are rows of an ordinary DataFrame: an opaque `binary`
  * payload plus TYPED metadata (kind/width/height/duration/codec) that
  * lives in normal columns, so Catalyst can prune/filter on metadata
  * WITHOUT touching the bytes (e.g. `kind = 'video'` never deserializes
  * a payload). That is the property that makes this layout work at
  * 100 TB: the scan reads metadata columns only, and the binary column
  * is loaded just for rows that survive the filters.
  *
  * Decode/feature-extract runs as `mapPartitions` with an explicit batch
  * shape (the JVM analogue of `mapInPandas`): rows stream through in
  * groups of `batchSize`, so per-batch setup (a real codec/model handle)
  * is amortized and peak memory is bounded by one batch of payloads —
  * never a whole partition.
  *
  * ALL THREE MODALITIES DECODE REAL CONTENT with JDK-only codecs:
  * images via `javax.imageio` ([[ImageCodec]] — PNG/BMP/GIF/JPEG),
  * audio via `javax.sound.sampled` ([[AudioCodec]] — PCM WAV/AU/AIFF),
  * and MJPEG-AVI video via [[AviCodec]] (RIFF container parsing +
  * per-frame JPEG decode). Beyond the JDK, two codecs `javax.sound`
  * CANNOT read decode through pure-JVM arms: IMA-ADPCM WAV
  * ([[AdpcmCodec]], lossy telephony/game audio) and FLAC
  * ([[FlacCodec]], the lossless format of public speech corpora) —
  * the template for dropping in further external codecs: the dispatch
  * keys on the asset's `codec` metadata, so each new codec changes one
  * arm. Features and perceptual hashes come from
  * actual pixels/samples, so two encodings of the same content dedup
  * together. [[StubDecoder]] remains only for codecs with no JVM
  * decoder in this environment (H.264, MP3, …).
  */
object BinaryPipeline {

  /** Typed metadata carried beside the opaque payload (MM1). */
  final case class MediaAsset(
      assetId: Long,
      kind: String, // image | audio | video
      width: Int,
      height: Int,
      durationMs: Long,
      codec: String,
      data: Array[Byte])

  final case class AssetFeature(assetId: Long, feature: Array[Float])

  final case class FrameFeature(
      assetId: Long, frameIdx: Int, width: Int, height: Int,
      feature: Array[Float])

  // ---------------------------------------------------------- decoders

  /** Per-kind decode dispatch: real pixels for images (`javax.imageio`),
    * real PCM samples for audio (`javax.sound.sampled`), real first-frame
    * pixels for MJPEG-AVI video ([[AviCodec]]); the deterministic stub
    * remains only for codecs the JDK cannot decode (H.264 etc.). All
    * produce [[StubDecoder.dim]] floats.
    */
  private def decodeFeature(a: MediaAsset, salt: Int): Array[Float] =
    (a.kind, a.codec) match {
      case ("image", _) => ImageCodec.features(a.data)
      case ("audio", "ima_adpcm") => // non-JDK arm: pure-JVM IMA ADPCM
        AudioCodec.featuresOf(AdpcmCodec.samples(a.data))
      case ("audio", "flac") => // non-JDK arm: pure-JVM FLAC (lossless)
        AudioCodec.featuresOf(FlacCodec.samples(a.data))
      case ("audio", _) => AudioCodec.features(a.data)
      case ("video", "mjpeg") =>
        ImageCodec.featuresOf(AviCodec.decodeFrame(a.data, 0))
      case _ => StubDecoder.decode(a.data, salt)
    }

  /** Locality-preserving threshold hash over a feature vector in [0,1]:
    * bit i compares `feature[i mod dim]` against a 4-tier threshold
    * (0.15/0.35/0.55/0.75 — a thermometer code spanning the full unit
    * range so high-energy features don't saturate one level), so close
    * feature vectors flip few bits. Used for the non-image perceptual
    * hashes.
    */
  private def thresholdHash64(f: Array[Float]): Long = {
    var h = 0L
    var i = 0
    while (i < 64) {
      val thr = 0.15f + 0.2f * (i / StubDecoder.dim)
      if (f(i % StubDecoder.dim) > thr) h |= (1L << i)
      i += 1
    }
    h
  }

  /** STUB — stands in only for codecs the JDK cannot decode (H.264,
    * MP3, …); images, PCM audio and MJPEG video go through the real
    * codecs. Fully deterministic in (bytes, salt) so specs can assert
    * exact results.
    */
  object StubDecoder {
    val dim = 16

    def decode(bytes: Array[Byte], salt: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L + salt
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      var j = 0
      while (j < dim) {
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        out(j) = ((h & 0xffff) / 65535.0f); j += 1
      }
      out
    }
  }

  // ------------------------------------------------------------- MM1

  /** Deterministic asset table. Image rows carry REAL PNG payloads
    * (an id-keyed 8×8 block pattern rendered with java.awt and encoded
    * by ImageIO); audio rows carry REAL 16-bit PCM WAV payloads (an
    * id-keyed tone: distinct pitch + loudness per id, so loudness/ZCR
    * features — and therefore perceptual hashes — land far apart);
    * video rows carry REAL MJPEG AVI payloads (4 fps of id+frame-keyed
    * JPEG patterns in a spec-shaped RIFF container).
    */
  def syntheticAssets(spark: SparkSession, n: Int,
      melodicAudio: Boolean = false): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val w = 64 + (id % 4).toInt * 32
      val toneMs = 120 + (id % 5).toInt * 60
      val videoMs = 1000L * (1 + id % 5)
      val bytes = kind match {
        case "image" => ImageCodec.encode(syntheticImage(id, w, 64), "png")
        case "audio" if melodicAudio =>
          // SCALE-AXIS audio: an 8-segment melody with per-segment
          // (pitch, loudness) keyed by (id, segment). The steady-tone
          // corpus below has only 2 degrees of freedom, which the
          // 4-tier threshold hash quantizes into ~16 cells — 80 tones
          // already mass-collide (376 of mm3's 616 pairs) and a 10×
          // corpus would go QUADRATIC. One independent (RMS, ZCR) pair
          // per feature frame grows the cell space to ~16^8, so
          // spurious collisions stay negligible at any bench factor
          // while recode twins still collide at hamming 0.
          AudioCodec.synthMelody(
            (0 until AudioCodec.frames).map { seg =>
              (200 + 12.3 * math.floorMod(mix64(id * 131 + seg), 120),
                0.2 + 0.006 * math.floorMod(mix64(id * 131 + seg + 7919), 100))
            }, ms = toneMs)
        case "audio" => AudioCodec.synthTone(
          hz = 200 + 37.0 * (id % 40), ms = toneMs,
          amplitude = 0.2 + 0.06 * (id % 10))
        case _ =>
          // real MJPEG AVI at 4 fps: one JPEG frame per 250 ms, each an
          // id+frame-keyed pattern (distinct frames, distinct assets)
          val frames = (0 until (videoMs / 250).toInt).map(f =>
            AviCodec.jpeg(syntheticImage(id * 1000 + f, w, 64)))
          AviCodec.write(frames, w, 64, fps = 4)
      }
      val (durationMs, codec) = kind match {
        case "image" => (0L, "png")
        case "audio" => (toneMs.toLong, "pcm_s16le")
        case _ => (videoMs, "mjpeg")
      }
      MediaAsset(id, kind, w, 64, durationMs, codec, bytes)
    }
  }

  /** Deterministic id-keyed test image: 8×8 grid of black/white blocks
    * decided by a splitmix64 bit of (id, cell) — per-id ~random visual
    * content, stable across JVMs.
    */
  private[multimodal] def syntheticImage(id: Long, w: Int,
      h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cell = (y * 8 / h) * 8 + (x * 8 / w)
        img.setRGB(x, y, if (mixBit(id * 64 + cell)) 0xffffff else 0x000000)
        x += 1
      }
      y += 1
    }
    img
  }

  private def mixBit(z0: Long): Boolean = mix64(z0) < 0

  /** splitmix64 finalizer — the deterministic per-(id, salt) randomness
    * behind the synthetic patterns; `% k` uses of it mask to
    * non-negative first.
    */
  private[multimodal] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Decode + featurize with explicit batching. `decodeBatches` (if
    * given) counts batch invocations so tests can assert the batch shape
    * actually takes effect.
    */
  def features(assets: Dataset[MediaAsset], batchSize: Int,
      decodeBatches: Option[LongAccumulator] = None): Dataset[AssetFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        decodeBatches.foreach(_.add(1))
        // per-batch setup (codec/model handles) is amortized here
        batch.iterator.map(a =>
          AssetFeature(a.assetId, decodeFeature(a, salt = 0)))
      }
    }
  }

  // ------------------------------------------------------------- MM2

  /** Frame-sample + resize pipeline over video assets: every
    * `frameEveryMs` one frame is decoded at the target resolution.
    * MJPEG-AVI payloads take the REAL path — the RIFF container is
    * parsed once per asset, the stored frame nearest each sample tick
    * is JPEG-decoded, bilinear-resized to (resizeW, resizeH) and
    * featurized from actual pixels; non-JDK codecs fall back to the
    * stub. Output is long-format (one row per frame), which keeps
    * downstream aggregation distributable.
    */
  def sampleFrames(assets: Dataset[MediaAsset], frameEveryMs: Long,
      resizeW: Int, resizeH: Int, batchSize: Int = 32): Dataset[FrameFeature] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          val nFrames = math.max(1L, a.durationMs / frameEveryMs).toInt
          if (a.codec == "mjpeg") {
            val stored = AviCodec.frames(a.data) // parse the RIFF once
            val msPerStored = a.durationMs.toDouble / stored.size
            (0 until nFrames).iterator.map { f =>
              val idx = math.min(stored.size - 1,
                (f * frameEveryMs / msPerStored).toInt)
              val img = ImageCodec.resize(ImageCodec.read(stored(idx)),
                resizeW, resizeH)
              FrameFeature(a.assetId, f, resizeW, resizeH,
                ImageCodec.featuresOf(img))
            }
          } else {
            (0 until nFrames).iterator.map { f =>
              FrameFeature(a.assetId, f, resizeW, resizeH,
                StubDecoder.decode(a.data,
                  salt = f * 31 + resizeW * 7 + resizeH))
            }
          }
        }
      }
    }
  }

  /** Metadata-only pruning helper: select assets of a kind WITHOUT
    * reading payload bytes (projection keeps `data` out of the scan).
    */
  def metadataOnly(assets: DataFrame): DataFrame =
    assets.select("assetId", "kind", "width", "height", "durationMs", "codec")

  // ------------------------------------------------------------- MM3

  final case class AssetHash(assetId: Long, phash: Long)

  /** Perceptual 64-bit hash computed in the SAME batch pass as the
    * decode (never materializes features twice). Images get the REAL
    * average-hash ([[ImageCodec.aHash64]]: 8×8 grayscale, threshold by
    * mean — hamming tracks visual difference, so re-encodings of the
    * same pixels collide at distance 0). Audio gets the threshold hash
    * over its REAL loudness/ZCR features (re-containered PCM collides
    * at distance 0 likewise); video falls back to the same hash over
    * the stub features, keeping the locality contract.
    */
  def phashes(assets: Dataset[MediaAsset],
      batchSize: Int = 32): Dataset[AssetHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val h = (a.kind, a.codec) match {
            case ("image", _) => ImageCodec.aHash64(a.data)
            case ("video", "mjpeg") => // visual hash of the first frame
              ImageCodec.aHash64Of(AviCodec.decodeFrame(a.data, 0))
            case _ => thresholdHash64(decodeFeature(a, salt = 0))
          }
          AssetHash(a.assetId, h)
        }
      }
    }
  }

  /** MM3: near-duplicate media pairs by perceptual hash — the multimodal
    * face of the dedup stack. Candidate blocking + hamming verification
    * reuse [[graft.operators.HammingNearDup]] (same operator as text
    * simhash d4), so the 100 TB shape is identical: explode ×(maxHam+1)
    * blocks, one equi-join shuffle, no all-pairs comparison.
    */
  def phashDedup(assets: Dataset[MediaAsset], maxHam: Int = 3,
      batchSize: Int = 32): DataFrame =
    graft.operators.HammingNearDup.pairs(
      phashes(assets, batchSize).toDF(), "assetId", "phash", maxHam)
}
