package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode/feature-extraction runs
  * per-partition in batches (the Scala analogue of mapInPandas batch UDFs).
  *
  * Image, audio AND video decode are REAL, all through JDK codecs: PNG via
  * `javax.imageio.ImageIO` ([[imageFeatures]], [[resizeImages]]), WAV/PCM
  * via `javax.sound.sampled.AudioSystem` ([[audioFeatures]]), and
  * multi-frame video as animated GIF via ImageIO's GIF sequence
  * reader/writer ([[videoFrameFeatures]]). All three containers are
  * lossless here (PNG and PCM always; GIF whenever each frame has ≤256
  * distinct colors and carries an exact palette), so the decoded samples —
  * and therefore every feature — are exactly reproducible by an oracle
  * that never touches the bytes. Text decode is a codegen'd column
  * conversion ([[decodeTextAssets]]). The pluggable [[Decoder]] boundary
  * (`StubDecoder`) remains only for codecs outside the JDK (H.264 etc.).
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

  /** The on-disk shape [[syntheticImageAssets]] writes — what a
    * `readStream` over an image-asset landing directory declares. */
  val assetWriteSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

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
    * formats the JDK cannot decode (H.264/mp4 and friends); image, audio
    * and animated-GIF video have real JDK decode paths in
    * [[imageFeatures]] / [[audioFeatures]] / [[videoFrameFeatures]]. */
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
  // REAL video decode: multi-frame animated GIF via JDK ImageIO.
  // ---------------------------------------------------------------------

  /** Per-sampled-frame features from a real multi-frame decode: the
    * [[ImageFeatures]] integer surface plus the frame index. */
  final case class VideoFrameFeatures(
      asset_id: Long, frame_idx: Long, width: Int, height: Int, n_px: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, sum_luma: Long,
      n_l0: Long, n_l1: Long, n_l2: Long, n_l3: Long, mean_luma: Double)

  /** Deterministic synthetic VIDEO corpus with REAL animated-GIF payloads.
    * Pixel (x, y) of frame `f` of asset `id` is the pure integer formula
    * {{{ r = (31 id + 29 f +  7 x + 13 y) mod 256
    *     g = (17 id + 37 f +  3 x +  5 y) mod 256
    *     b = (11 id + 41 f + 19 x + 23 y) mod 256 }}}
    * over a `(4 + id mod 5) × (4 + id mod 3)` canvas and `3 + id mod 4`
    * frames at 10 fps. Each frame is written TYPE_BYTE_INDEXED with an
    * exact palette of its own colors (≤ w·h ≤ 48 « 256 entries) and
    * interlacing disabled — under those two conditions the JDK GIF
    * writer/reader round-trip is bit-exact (the default path is NOT: RGB
    * input gets quantized to a web-safe palette, and interlaced output is
    * mis-deinterlaced on read), which is what makes [[videoFrameFeatures]]
    * oracle-checkable without the oracle parsing a GIF. Encoding runs
    * per-partition (the codec boundary); everything else is narrow
    * column plumbing. */
  def syntheticVideoAssets(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      val writerHolder = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
      require(writerHolder.hasNext, "JDK GIF writer missing")
      ids.map { id =>
        val w = 4 + (id % 5).toInt
        val h = 4 + (id % 3).toInt
        val nf = 3 + (id % 4).toInt
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val param = writer.getDefaultWriteParam
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nf) {
          val px = Array.ofDim[Int](h, w)
          val pal = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = ((id * 31 + f * 29 + x * 7 + y * 13) % 256).toInt
              val g = ((id * 17 + f * 37 + x * 3 + y * 5) % 256).toInt
              val b = ((id * 11 + f * 41 + x * 19 + y * 23) % 256).toInt
              val c = (r << 16) | (g << 8) | b
              px(y)(x) = c
              if (!pal.contains(c)) pal(c) = pal.size
              x += 1
            }
            y += 1
          }
          val m = pal.size
          val rr = new Array[Byte](m); val gg = new Array[Byte](m); val bb = new Array[Byte](m)
          pal.foreach { case (c, i) =>
            rr(i) = ((c >> 16) & 0xff).toByte
            gg(i) = ((c >> 8) & 0xff).toByte
            bb(i) = (c & 0xff).toByte
          }
          val icm = new java.awt.image.IndexColorModel(8, m, rr, gg, bb)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, px(y)(x)); x += 1 }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
          f += 1
        }
        writer.endWriteSequence(); ios.close(); writer.dispose()
        (id, "video", bos.toByteArray, w, h, nf.toLong * 100L)
      }
    }.toDF("asset_id", "media_type", "payload", "width", "height", "duration_ms")
  }

  /** REAL video decode + frame-sampled feature extraction: ImageIO's GIF
    * sequence reader parses the animated-GIF container, every `everyK`-th
    * frame (0, k, 2k, …) is decoded and reduced to the [[ImageFeatures]]
    * integer surface. This is [[frameSamplePlan]] made real: the plan
    * variant generates (asset, ts) rows from metadata alone; this one
    * pays the codec cost. 100 TB shape: identical to [[imageFeatures]] —
    * a shuffle-free per-partition narrow map, one reader per payload,
    * O(frame) state; the container is scanned sequentially (inherent to
    * video codecs — sampling saves decode work, not I/O). */
  def videoFrameFeatures(assets: DataFrame, everyK: Int): Dataset[VideoFrameFeatures] = {
    require(everyK >= 1, s"need everyK >= 1; got $everyK")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("media_type") === "video" && col("payload").isNotNull)
      .select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          reader.setInput(javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes)), false)
          val nf = reader.getNumImages(true)
          val out = (0 until nf by everyK).map { f =>
            val img = reader.read(f)
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
            VideoFrameFeatures(id, f.toLong, w, h, nPx, sr, sg, sb, sl,
              hist(0), hist(1), hist(2), hist(3),
              BigDecimal(sl.toDouble / nPx).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
          reader.dispose()
          out
        }
      }
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
