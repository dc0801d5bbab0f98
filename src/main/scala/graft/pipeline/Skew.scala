package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path. Spark's AQE rewrites
  * skewed SORT-MERGE joins at runtime, but cannot help when the skew sits in
  * an aggregation key, when AQE is disabled (streaming), or when one hot key
  * exceeds what a single rewritten split should carry. These operators make
  * the classic salting patterns first-class and deterministic (the salt is a
  * hash of the carrying row, never a random number — reruns and retries
  * produce identical partitioning, which speculative execution requires).
  *
  * Semantics are EXACTLY those of the unsalted equivalent (pinned by the
  * `join_salted_skew` driver oracle and SkewSpec's equivalence tests); only
  * the physical shuffle distribution changes.
  */
object Skew {

  /** Deterministic per-row salt in [0, salt): a hash of the whole probe row
    * (or of `saltOn` when given). Using row content (not the join key!) is
    * the point — rows of one hot key draw different salts and spread over
    * `salt` reducers. Caveat: BYTE-IDENTICAL rows share a salt, so a probe
    * of pure key duplicates (e.g. after projecting away every payload
    * column) does not spread — pass `saltOn` (a unique id / line number /
    * payload column) when the row itself is not discriminating. */
  private def rowSalt(df: DataFrame, salt: Int, saltOn: Option[Column]): Column =
    pmod(hash(saltOn.map(Seq(_)).getOrElse(df.columns.map(col).toSeq): _*), lit(salt))

  private def requireNoSaltCol(df: DataFrame, which: String): Unit =
    require(!df.columns.contains("__salt"),
      s"$which side already has a '__salt' column — rename it first")

  /** Salted equi-join on `keys`: the probe (large, skewed) side gets a
    * deterministic row-hash salt; the build side is replicated `salt` ways.
    * One hot probe key then lands on `salt` reducers instead of one.
    * Result columns and rows are identical to
    * `probe.join(build, keys, joinType)`. Supports inner and left joins
    * (the replicate-build trick preserves exactly those). Build-side
    * replication multiplies the build shuffle by `salt` — use for a build
    * side too big to broadcast but far smaller than the probe side. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner",
                 saltOn: Option[Column] = None): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, not '$joinType'")
    requireNoSaltCol(probe, "probe"); requireNoSaltCol(build, "build")
    val p = probe.withColumn("__salt", rowSalt(probe, salt, saltOn))
    val b = build.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    p.join(b, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted aggregation: groupBy (keys, salt) computes partial
    * aggregates, then a second tiny groupBy (keys) merges them — the first
    * shuffle spreads a hot key over `salt` reducers, the second moves only
    * `salt` rows per key. `partial` builds the per-group partial aggregates
    * from scratch; `merge` combines partial columns of the same key (column
    * names must line up). Spark's own hash aggregation already does
    * map-side partials, so reach for this only when single-reducer hot keys
    * still dominate the shuffle (billions of rows behind one key). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
                partial: Seq[Column], merge: Seq[Column],
                saltOn: Option[Column] = None): DataFrame = {
    require(salt > 0, "salt must be positive")
    requireNoSaltCol(df, "input")
    df.withColumn("__salt", rowSalt(df, salt, saltOn))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
