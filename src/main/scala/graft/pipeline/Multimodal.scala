package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode/feature-extraction runs
  * per-partition in batches (the Scala analogue of mapInPandas batch UDFs).
  *
  * The actual codec step is STUBBED — this container has no image/audio
  * libraries — behind [[Decoder]]: `StubDecoder` produces deterministic fake
  * features from the bytes so the Spark-side contract (schema, partitioning,
  * batch iteration, null handling) is real and tested; swap in a JNI/JavaCV
  * decoder in production without touching the pipeline shape.
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
    * hash of the payload bytes. NOT a real codec — stands in for
    * image-decode / audio-resample / video-frame-sample. */
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
