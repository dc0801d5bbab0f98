package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding quantization for storage/serving-scale vector pipelines:
  * symmetric per-vector int8 codes (the layout faiss-style scalar
  * quantizers and int8 ONNX embeddings use — 4× smaller than float32,
  * 8× smaller than float64, dot products stay integer until the final
  * per-pair rescale).
  *
  * Every step is engine-portable: the scale is an exact IEEE division of
  * the vector's max-abs by 127, and codes are floor(x/scale + 0.5) — floor
  * is deterministic for every double, unlike round-half-* conventions that
  * differ between engines.
  *
  * Scale design: long-form posexplode → groupBy, not higher-order array
  * lambdas (which are CodegenFallback and re-evaluate per element). Two
  * map-side-combinable aggregations by vector id, no shuffle keyed on
  * anything skewable; 100 TB of vectors is linear scan + hash agg.
  */
object Quantization {

  /** (id, pos, code, scale) long form: one row per vector element with its
    * symmetric int8 code and the per-vector scale.
    * `dequantized(pos) = code * scale`; an all-zero vector quantizes to
    * scale 0 with all-zero codes. This is the canonical scan-shaped output
    * (every column scalar — joins, verification dumps, and columnar sinks
    * consume it directly); [[int8]] packs it back per vector. */
  def int8Rows(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ex = df
      .select(col(idCol), posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "val")))
    val scales = ex.groupBy(idCol)
      .agg((max(abs(col("val"))) / 127.0).as("scale"))
    ex.join(scales, Seq(idCol))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        when(col("scale") === 0.0, lit(0L))
          .otherwise(floor(col("val") / col("scale") + 0.5)).as("code"),
        col("scale"))
  }

  /** (id, scale, codes): per-vector symmetric int8 quantization with the
    * codes packed in element order. The pack stage is pure codegen: struct
    * collect + array_sort (pos is the leading struct field, so sorting
    * orders by position) + GetArrayStructFields — no higher-order lambda. */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    int8Rows(df, idCol, vecCol)
      .groupBy(idCol)
      .agg(
        array_sort(collect_list(struct(col("pos"), col("code"))))
          .getField("code").as("codes"),
        min(col("scale")).as("scale"))
      .select(col(idCol), col("scale"), col("codes"))
}
