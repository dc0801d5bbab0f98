package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TemporalJoins

class TemporalJoinsSpec extends SparkSuite {
  import spark.implicits._

  lazy val clicks = Seq(
    (1L, 1L, 4L),   // before any view -> nulls
    (2L, 1L, 5L),   // ties a view's ts -> view visible (<=), larger id wins
    (3L, 1L, 25L),  // after both views -> latest
    (4L, 2L, 50L)   // user with no views -> nulls
  ).toDF("event_id", "user_id", "ts")

  lazy val views = Seq(
    (1L, 5L, 100L, 1.0),
    (1L, 5L, 101L, 2.0), // same (user, ts) as view 100: tie broken by id
    (1L, 20L, 102L, 3.0)
  ).toDF("user_id", "ts", "view_id", "view_value")

  test("asofJoin: most recent right row at or before each left row") {
    val out = TemporalJoins.asofJoin(clicks, views, "user_id", "ts", "view_id")
      .select("event_id", "asof_view_id", "asof_view_value")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(1L) == (None, None))
    assert(out(2L) == (Some(101L), Some(2.0))) // <= semantics + max-id tie-break
    assert(out(3L) == (Some(102L), Some(3.0)))
    assert(out(4L) == (None, None))
    assert(out.size == 4) // left-outer: every click survives exactly once
  }

  test("asofJoin keeps the winning row's payload atomic when it holds nulls") {
    // the latest view carries a NULL value: the result must be
    // (view_id=102, value=NULL), never view 101's value stitched in
    val v = Seq(
      (1L, 5L, 101L, Some(2.0)),
      (1L, 20L, 102L, None)
    ).toDF("user_id", "ts", "view_id", "view_value")
    val out = TemporalJoins.asofJoin(
      Seq((1L, 1L, 25L)).toDF("event_id", "user_id", "ts"), v,
      "user_id", "ts", "view_id")
      .select("asof_view_id", "asof_view_value").head()
    assert(out.getLong(0) == 102L && out.isNullAt(1))
  }

  test("asofJoin equals a per-row reference on random colliding data") {
    val rnd = new scala.util.Random(42)
    // 10 keys x 50 timestamps over 500 rows: plenty of exact-ts collisions
    val ls = (0 until 300).map(i => (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(50).toLong))
    val rs = (0 until 200).map(i => (1000L + i, rnd.nextInt(10).toLong, rnd.nextInt(50).toLong, rnd.nextDouble()))
    val out = TemporalJoins.asofJoin(
      ls.toDF("event_id", "user_id", "ts"),
      rs.map { case (id, u, t, v) => (u, t, id, v) }.toDF("user_id", "ts", "view_id", "view_value"),
      "user_id", "ts", "view_id")
      .select("event_id", "asof_view_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val expected = ls.map { case (id, u, t) =>
      val cands = rs.filter(r => r._2 == u && r._3 <= t)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(c => (c._3, c._1))._1)) // latest ts, then max id
    }.toMap
    assert(out == expected)
  }

  test("asofJoin rejects overlapping payload columns") {
    val badRight = views.withColumnRenamed("view_id", "event_id")
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(clicks, badRight, "user_id", "ts", "event_id")
    }
  }

  // negative timestamps included: integer DIV truncates toward zero rather
  // than flooring, but binning only needs monotonicity (x <= y implies
  // x DIV b <= y DIV b), which truncation preserves — the sweep proves it
  lazy val lefts = (0L until 60L).map(i => (i, i % 3, i * 7L % 100 - 50L))
    .toDF("l_id", "k", "ts")
  lazy val rights = Seq(
    (10L, 0L, -45L, -20L), (11L, 1L, -50L, 49L), (12L, 2L, -10L, -9L),
    (13L, 0L, 40L, 49L), (14L, 1L, 0L, 0L) // point interval
  ).toDF("r_id", "k", "w_start", "w_end")

  test("rangeJoinBinned equals the naive BETWEEN join, keyed and unkeyed") {
    def naive(keyed: Boolean) =
      lefts.join(rights.withColumnRenamed("k", "rk"),
          col("ts") >= col("w_start") && col("ts") <= col("w_end") &&
            (if (keyed) col("k") === col("rk") else lit(true)))
        .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bin <- Seq(1L, 7L, 64L, 1000L)) {
      val keyed = TemporalJoins.rangeJoinBinned(lefts, rights,
          "ts", "w_start", "w_end", bin, keys = Seq("k"))
        .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(keyed == naive(keyed = true), s"keyed mismatch at bin=$bin")
      val unkeyed = TemporalJoins.rangeJoinBinned(lefts.drop("k"), rights.drop("k"),
          "ts", "w_start", "w_end", bin)
        .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(unkeyed == naive(keyed = false), s"unkeyed mismatch at bin=$bin")
    }
  }

  test("rangeJoinBinned fails fast on an interval spanning too many bins") {
    val wide = Seq((1L, 0L, 0L, 50000L)).toDF("r_id", "k", "w_start", "w_end")
    val ex = intercept[Exception] {
      TemporalJoins.rangeJoinBinned(lefts, wide, "ts", "w_start", "w_end",
        binWidth = 10L, keys = Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("rangeJoinBinned")))
  }
}
