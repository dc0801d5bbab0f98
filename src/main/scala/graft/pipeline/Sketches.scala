package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketching for key-count estimation at corpus scale — the
  * companion to the KMV cardinality sketch (functions/KmvDistinct.scala).
  * Deterministic by construction: hash rows are md5-hex prefixes parsed
  * as integers, so any SQL engine replays the counters and estimates
  * bit-for-bit (no engine-private hash like xxhash/murmur leaks into
  * results).
  */
object Sketches {

  /** Bucket index of `key` on hash row `i`: first 8 md5-hex digits (32
    * bits, exact in a long) of the row-seeded key, mod `width`. */
  private def bucket(key: Column, i: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$i|"), key)), 1, 8), 16, 10)
      .cast("long") % width

  /** Count-min sketch estimates next to exact counts, per distinct key.
    *
    * Build: `depth` counter tables of `width` buckets each — one
    * map-side-combinable aggregation per hash row over the keyed input
    * (the counter state is depth×width longs TOTAL, independent of input
    * size). Probe: every distinct key reads its `depth` buckets and takes
    * the minimum — the classic CM upper bound: est ≥ exact always, with
    * overcount bounded by collisions (ε ≈ e/width of the total mass).
    *
    * At 100 TB the exact per-key count demands a full shuffle keyed by a
    * possibly-skewed key; the sketch build shuffles depth×width bounded
    * groups regardless of skew or cardinality. The exact count is
    * computed here alongside ONLY because the operator's contract is an
    * accuracy report (est vs exact); drop it for a pure sketch.
    * Returns (key, est_count, exact_count). */
  def countMinReport(df: DataFrame, keyCol: String,
                     depth: Int = 3, width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2; got $depth/$width")
    val keyed = df.select(col(keyCol).cast("string").as("key"))
    val counters = (0 until depth).map { i =>
      keyed.groupBy(bucket(col("key"), i, width).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .select(lit(i).as("row"), col("bucket"), col("cnt"))
    }.reduce(_ unionByName _)
    val probes = keyed.distinct().select(col("key"),
      explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"), bucket(col("key"), i, width).as("bucket"))): _*)).as("rb"))
      .select(col("key"), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    val est = probes.join(broadcast(counters), Seq("row", "bucket"))
      .groupBy("key").agg(min("cnt").as("est_count"))
    val exact = keyed.groupBy("key").agg(count(lit(1)).as("exact_count"))
    est.join(exact, Seq("key"))
  }
}
