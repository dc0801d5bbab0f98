package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time joins that Spark has no built-in operator for, composed from
  * shuffle-lean primitives so they survive a 100 TB corpus:
  *
  *  - [[asofJoin]]: union + window carry-forward — ONE shuffle by key, one
  *    sort per partition, O(1) carry state per key during the linear scan.
  *    Never a range probe per row, never a fan-out join.
  *  - [[rangeJoinBinned]]: the classic binned range join — intervals are
  *    replicated onto fixed-width time bins and matched with a plain
  *    equi-join on (keys, bin), then filtered exactly. Work scales with
  *    (rows × bins-per-interval), never rows × intervals; a naive
  *    `l.ts BETWEEN r.start AND r.end` join degenerates to
  *    BroadcastNestedLoop/cartesian at scale.
  *
  * Timestamps are plain orderable numerics (the testdata's nanosecond
  * longs, epoch seconds, ...) — no calendar semantics assumed.
  */
object TemporalJoins {

  /** As-of join (DuckDB/kdb semantics): every left row is matched with the
    * single most recent right row having `right.ts <= left.ts` and the same
    * key; left rows with no prior right row keep nulls (left-outer).
    *
    * Plan shape: both inputs are tagged and unioned, shuffled ONCE by
    * `keyCol`, sorted within the partition by (ts, side, tie), and scanned
    * linearly with `last(_, ignoreNulls)` carry-forward — right rows sort
    * before left rows at equal timestamps (<= semantics), and among right
    * rows with equal timestamps the largest `rightTieCol` wins
    * (deterministic under any partitioning).
    *
    * The right frame must carry `keyCol`, `tsCol` and its payload columns,
    * and `(keyCol, rightTieCol)` must identify right rows uniquely (it is
    * the match key); every non-key payload column is returned prefixed
    * `asof_`. Column sets of left and right (minus key/ts) must be
    * disjoint.
    *
    * The window carries ONLY the winning row's tie id; the payload columns
    * are equi-joined back in one piece afterwards — a per-column
    * `last(_, ignoreNulls)` carry would silently stitch together values
    * from DIFFERENT right rows whenever the winning row holds a genuine
    * null payload (ignoreNulls cannot tell a real null from the union's
    * placeholder nulls). */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String, rightTieCol: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    val rightPayload = right.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    require(rightPayload.contains(rightTieCol),
      s"rightTieCol $rightTieCol must be a non-key column of the right frame")
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"overlapping payload columns: ${leftPayload.intersect(rightPayload).mkString(",")}")
    val tieType = right.schema(rightTieCol).dataType
    val l2 = left.select(
      col(keyCol) +: col(tsCol) +: lit(1).as("__side") +:
        (leftPayload.map(col) :+ lit(null).cast(tieType).as("__tie")): _*)
    val r2 = right.select(
      col(keyCol) +: col(tsCol) +: lit(0).as("__side") +:
        (leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          col(rightTieCol).as("__tie")): _*)
    // __tie is null on every left row and (assumed) non-null on right rows,
    // and __side already separates the sides at equal timestamps — the tie
    // ordering only ever compares right rows with right rows. Null ordering
    // is stated explicitly on BOTH sort keys so a SQL mirror is unambiguous
    // (engines disagree on the default).
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc_nulls_first, col("__side").asc,
        col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l2.unionByName(r2)
      .select(col(keyCol) +: col(tsCol) +: col("__side") +: (leftPayload.map(col) :+
        last(col("__tie"), ignoreNulls = true).over(w).as("__match")): _*)
      .where(col("__side") === 1).drop("__side")
    val matchSide = right.select(
      col(keyCol).as("__rk") +: col(rightTieCol).as("__match") +:
        rightPayload.map(c => col(c).as(s"asof_$c")): _*)
    carried
      .join(matchSide,
        carried(keyCol) === matchSide("__rk") &&
          carried("__match") === matchSide("__match"), "left")
      .drop("__rk", "__match")
  }

  /** Range join via time binning: pairs (l, r) with equal `keys` and
    * `l(leftTs)` in the inclusive interval [r(rightStart), r(rightEnd)].
    *
    * Each right interval is exploded onto the fixed-width bins it covers
    * and each left row lands in exactly ONE bin, so the equi-join on
    * (keys, bin) proposes every true pair exactly once (no dedup needed);
    * the exact BETWEEN filter then discards same-bin near-misses. Shuffle
    * volume is |left| + |right| × bins-per-interval — pick `binWidth` near
    * the median interval length so the replication factor stays O(1).
    *
    * Intervals spanning >= `maxBinsPerInterval` bins fail fast (a single
    * unbounded interval would otherwise replicate onto millions of bins —
    * the silent 100 TB fan-out this operator exists to avoid). */
  def rangeJoinBinned(left: DataFrame, right: DataFrame,
                      leftTs: String, rightStart: String, rightEnd: String,
                      binWidth: Long, keys: Seq[String] = Nil,
                      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // integer DIV, not floating division: nanosecond epochs exceed the
    // 2^53 exact-double range and would mis-bin under a double round-trip
    val lb = left.withColumn("__bin", expr(s"CAST($leftTs DIV $binWidth AS BIGINT)"))
    val startB = expr(s"CAST($rightStart DIV $binWidth AS BIGINT)")
    val endB = expr(s"CAST($rightEnd DIV $binWidth AS BIGINT)")
    val cappedEnd = when(endB - startB >= maxBinsPerInterval,
      raise_error(concat(lit(s"rangeJoinBinned: interval spans >= $maxBinsPerInterval bins "),
        lit(s"at binWidth=$binWidth — raise binWidth or maxBinsPerInterval"))))
      .otherwise(endB)
    // inverted intervals (end < start) can never satisfy the BETWEEN filter;
    // drop them up front — otherwise sequence() would count DOWNWARD and
    // silently replicate the row onto |span| bins of wasted shuffle
    val rb = right.where(col(rightStart) <= col(rightEnd))
      .withColumn("__bin", explode(sequence(startB, cappedEnd)))
    lb.join(rb, keys :+ "__bin")
      .where(col(leftTs) >= col(rightStart) && col(leftTs) <= col(rightEnd))
      .drop("__bin")
  }
}
