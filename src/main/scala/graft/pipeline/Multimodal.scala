package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode/feature-extraction runs
  * per-partition in batches (the Scala analogue of mapInPandas batch UDFs).
  *
  * Image and audio decode are REAL: PNG via JDK `javax.imageio.ImageIO` and
  * WAV/PCM via JDK `javax.sound.sampled.AudioSystem` — see [[imageFeatures]]
  * and [[audioFeatures]], both lossless codecs so the decoded samples (and
  * therefore every feature) are exactly reproducible by an oracle that
  * never touches the bytes. Text decode is a codegen'd column conversion
  * ([[decodeTextAssets]]). Only video frame DECODING remains behind the
  * pluggable [[Decoder]] boundary (`StubDecoder`), since the JDK ships no
  * video codec; the frame-sampling PLAN is real ([[frameSamplePlan]]).
  */
object Multimodal {

  /** Asset table schema: media payload + typed metadata, the layout a
    * 100 TB multimodal corpus would use (payload column prunable; metadata
    * usable for partition pruning without touching bytes). */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  final case class MediaFeatures(
      assetId: Long, mediaType: String, nBytes: Long,
      sha: String, features: Array[Float])

  /** The pluggable codec boundary. Implementations must be deterministic
    * per byte payload. */
  trait Decoder extends Serializable {
    def decode(mediaType: String, payload: Array[Byte]): Array[Float]
  }

  /** Deterministic fake decoder: 8 pseudo-features derived from a rolling
    * hash of the payload bytes. NOT a real codec — stands in only for
    * video-frame decode (the JDK has no video codec); image and audio have
    * real JDK decode paths in [[imageFeatures]] / [[audioFeatures]]. */
  object StubDecoder extends Decoder {
    def decode(mediaType: String, payload: Array[Byte]): Array[Float] = {
      val h = new Array[Long](8)
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xffL
        h(i % 8) = h(i % 8) * 31 + b
        i += 1
      }
      h.map(x => ((x % 1000L).toFloat / 1000f))
    }
  }

  /** Batch feature extraction: per-partition iteration (one decoder instance
    * per partition, no per-row setup cost), null payloads skipped — the
    * mapInPandas-shaped contract. */
  def extractFeatures(assets: DataFrame, decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap {
          case (_, _, null) => Iterator.empty
          case (id, mt, bytes) =>
            val sha = graft.model.Hashing.sha256HexUpper(bytes)
            Iterator.single(MediaFeatures(id, mt, bytes.length.toLong, sha, decoder.decode(mt, bytes)))
        }
      }
  }

  /** REAL (non-stub) decode path for text-typed media: the payload bytes
    * are UTF-8 text, so decode is a codegen'd column conversion — no
    * mapPartitions, no external codec — and downstream feature extraction
    * reuses the text-analysis operators unchanged. This exercises the full
    * multimodal contract (opaque binary column + typed metadata → decoded
    * modality → features) end-to-end without the stub. */
  def decodeTextAssets(assets: DataFrame): DataFrame =
    assets.where(col("media_type") === "text" && col("payload").isNotNull)
      .select(col("asset_id"), decode(col("payload"), "UTF-8").as("text"))

  /** Resize metadata transform (pure column math — no decode needed): target
    * box fit preserving aspect ratio. */
  def resizePlan(assets: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(maxDim) / col("width"), lit(maxDim) / col("height"), lit(1.0))
    assets.withColumn("target_width", floor(col("width") * scale).cast("int"))
      .withColumn("target_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sampling plan for videos: sample timestamps every `everyMs` over
    * the duration — generates (asset_id, frame_ts_ms) rows without decoding. */
  def frameSamplePlan(assets: DataFrame, everyMs: Long): DataFrame =
    assets.where(col("media_type") === "video" && col("duration_ms").isNotNull)
      .select(col("asset_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ts_ms"))

  // ---------------------------------------------------------------------
  // REAL image decode: PNG via JDK ImageIO.
  // ---------------------------------------------------------------------

  /** Per-image features from a real PNG decode: integer channel sums, a
    * 4-bucket luminance histogram, and the mean luminance. All counts/sums
    * are exact integers over the decoded pixels, so any engine that knows
    * the pixel values can reproduce them bit-for-bit. */
  final case class ImageFeatures(
      asset_id: Long, width: Int, height: Int, n_px: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, sum_luma: Long,
      n_l0: Long, n_l1: Long, n_l2: Long, n_l3: Long, mean_luma: Double)

  /** Integer BT.601-style luminance in [0, 255]:
    * `(299 r + 587 g + 114 b) / 1000` with integer division — chosen so an
    * oracle can mirror it with integer `//`. */
  @inline private def luma(r: Int, g: Int, b: Int): Int =
    (r * 299 + g * 587 + b * 114) / 1000

  /** Deterministic synthetic IMAGE corpus with REAL PNG payloads. Pixel
    * (x, y) of asset `id` is the pure integer formula
    * {{{ r = (31 id + 7 x + 13 y) mod 256
    *     g = (17 id + 3 x +  5 y) mod 256
    *     b = (11 id + 19 x + 23 y) mod 256 }}}
    * over a `(4 + id mod 5) × (4 + id mod 3)` canvas, PNG-encoded on the
    * executors. PNG is lossless, so decoding the payload recovers exactly
    * these values — which is what makes [[imageFeatures]] oracle-checkable
    * without the oracle ever parsing a PNG. Encoding runs per-partition
    * (the codec boundary), everything else is narrow column plumbing. */
  def syntheticImageAssets(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      ids.map { id =>
        val w = 4 + (id % 5).toInt
        val h = 4 + (id % 3).toInt
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
            val g = ((id * 17 + x * 3 + y * 5) % 256).toInt
            val b = ((id * 11 + x * 19 + y * 23) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, "image", bos.toByteArray, w, h)
      }
    }.toDF("asset_id", "media_type", "payload", "width", "height")
  }

  /** REAL image decode + feature extraction: `ImageIO.read` per payload
    * (one pass, per-partition — the mapInPandas-shaped codec boundary),
    * then integer channel sums / luminance histogram over the decoded
    * pixels. 100 TB shape: a narrow map with O(1) state per asset — no
    * shuffle at all; the payload column is read only here, and metadata
    * queries that skip this operator never touch the bytes. */
  def imageFeatures(assets: DataFrame): Dataset[ImageFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("media_type") === "image" && col("payload").isNotNull)
      .select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"asset $id: payload is not a decodable image")
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
          val hist = new Array[Long](4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              val l = luma(r, g, b)
              sr += r; sg += g; sb += b; sl += l
              hist(l / 64) += 1
              x += 1
            }
            y += 1
          }
          val nPx = w.toLong * h
          ImageFeatures(id, w, h, nPx, sr, sg, sb, sl,
            hist(0), hist(1), hist(2), hist(3),
            BigDecimal(sl.toDouble / nPx).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
  }

  /** REAL image resize at the codec boundary: decode the PNG, NEAREST-
    * NEIGHBOR downsample into the `maxDim` box (aspect preserved — the
    * same target-dimension rule as [[resizePlan]]), re-encode PNG.
    * Nearest-neighbor reads source pixel `(x·w/tw, y·h/th)` with integer
    * division, so the resized image's pixels — and any features extracted
    * from them — remain pure integer functions of the source pixels,
    * which keeps the whole decode→resize→encode→decode chain
    * oracle-checkable. Images already inside the box pass through
    * re-encoded at original size (scale capped at 1.0).
    * Returns (asset_id, media_type, payload, width, height) with the
    * resized payload/dims — same 100 TB shape as [[imageFeatures]]:
    * shuffle-free narrow map, one decoder per partition. */
  def resizeImages(assets: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim >= 1, s"need maxDim >= 1; got $maxDim")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("media_type") === "image" && col("payload").isNotNull)
      .select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"asset $id: payload is not a decodable image")
          val w = img.getWidth; val h = img.getHeight
          // the resizePlan rule, evaluated in the same IEEE double ops an
          // SQL oracle uses: scale = min(maxDim/w, maxDim/h, 1.0)
          val scale = math.min(math.min(maxDim.toDouble / w, maxDim.toDouble / h), 1.0)
          val tw = math.floor(w * scale).toInt
          val th = math.floor(h * scale).toInt
          val out = new java.awt.image.BufferedImage(tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < th) {
            var x = 0
            while (x < tw) {
              out.setRGB(x, y, img.getRGB(x * w / tw, y * h / th))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          (id, "image", bos.toByteArray, tw, th)
        }
      }.toDF("asset_id", "media_type", "payload", "width", "height")
  }

  // ---------------------------------------------------------------------
  // REAL audio decode: WAV/PCM via JDK javax.sound.sampled.
  // ---------------------------------------------------------------------

  /** Per-clip features from a real WAV decode: integer amplitude sums,
    * energy, peak, zero-crossing count, and RMS over the decoded 16-bit
    * PCM samples. */
  final case class AudioFeatures(
      asset_id: Long, n_samples: Long, sum_amp: Long, sum_sq: Long,
      max_abs: Long, zero_crossings: Long, rms: Double)

  /** Deterministic synthetic AUDIO corpus with REAL WAV payloads (16-bit
    * signed little-endian mono PCM @ 8 kHz, written by
    * `AudioSystem.write`). Sample `t` of asset `id` is the pure integer
    * formula {{{ s_t = ((id+1) * 2654435761 + t * 40503) mod 4001 - 2000 }}}
    * over `64 + 16 (id mod 8)` samples. WAV/PCM is lossless, so
    * [[audioFeatures]]' decode recovers exactly these values. */
  def syntheticAudioAssets(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val nSamp = 64 + 16 * (id % 8).toInt
        val pcm = new Array[Byte](nSamp * 2)
        var t = 0
        while (t < nSamp) {
          val s = (((id + 1) * 2654435761L + t.toLong * 40503L) % 4001L - 2000L).toInt
          pcm(2 * t) = (s & 0xff).toByte
          pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
          t += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamp.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        (id, "audio", bos.toByteArray, nSamp.toLong * 1000 / 8000)
      }
    }.toDF("asset_id", "media_type", "payload", "duration_ms")
  }

  /** REAL audio decode + feature extraction: `AudioSystem.getAudioInputStream`
    * parses the WAV container, then one pass over the 16-bit PCM frames
    * accumulates amplitude/energy/peak/zero-crossings. Zero-crossing rule:
    * a crossing whenever `sign(s_{t-1} < 0) != sign(s_t < 0)`. Same 100 TB
    * shape as [[imageFeatures]]: shuffle-free narrow map, O(1) state. */
  def audioFeatures(assets: DataFrame): Dataset[AudioFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("media_type") === "audio" && col("payload").isNotNull)
      .select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = in.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
            s"asset $id: expected 16-bit little-endian mono PCM, got $fmt")
          val data = in.readAllBytes(); in.close()
          val nSamp = data.length / 2
          var sum = 0L; var sq = 0L; var maxAbs = 0L; var zc = 0L
          var prevNeg = false
          var t = 0
          while (t < nSamp) {
            val s = (((data(2 * t + 1) & 0xff) << 8) | (data(2 * t) & 0xff)).toShort.toInt
            sum += s; sq += s.toLong * s
            val a = math.abs(s.toLong); if (a > maxAbs) maxAbs = a
            val neg = s < 0
            if (t > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            t += 1
          }
          AudioFeatures(id, nSamp.toLong, sum, sq, maxAbs, zc,
            BigDecimal(math.sqrt(sq.toDouble / nSamp)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
  }

  /** Deterministic synthetic asset corpus for tests/benchmarks (payload =
    * seeded variable-length bytes — the UTF-8 bytes of a sha256-hex prefix,
    * so the payload hash is reproducible by any engine's string sha256;
    * metadata consistent with type). */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val hex = sha2(col("id").cast("string"), 256)
    spark.range(n.toLong).select(
      col("id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (col("id") % 3 + 1).cast("int")).as("media_type"),
      hex.substr(lit(1), ((col("id") % 32) + 1) * 2).cast("binary").as("payload"),
      when(col("id") % 3 === 0, (col("id") % 640 + 16).cast("int")).as("width"),
      when(col("id") % 3 === 0, (col("id") % 480 + 16).cast("int")).as("height"),
      when(col("id") % 3 === 2, col("id") * 100 + 1000).as("duration_ms"))
  }
}
