package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Skew

class SkewSpec extends SparkSuite {
  import spark.implicits._

  // heavily skewed probe: one hot key carries 90% of the rows
  lazy val probe = ((1 to 900).map(i => ("hot", i.toLong)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toLong))).toDF("k", "v")
  lazy val build = (Seq("hot", "k0", "k1", "k2") :+ "unmatched")
    .map(k => (k, s"dim_$k")).toDF("k", "name")

  test("saltedJoin returns exactly the plain join's rows (inner and left)") {
    for (jt <- Seq("inner", "left")) {
      val plain = probe.join(build, Seq("k"), jt)
        .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).sorted.toSeq
      val salted = Skew.saltedJoin(probe, build, Seq("k"), salt = 7, joinType = jt)
        .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).sorted.toSeq
      assert(salted == plain, s"join type $jt")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(probe, build, Seq("k"), salt = 7, joinType = "full")
    }
  }

  test("saltedJoin spreads the hot key over multiple salt buckets") {
    val salts = probe.where(col("k") === "hot")
      .withColumn("__s", pmod(hash(probe.columns.map(col).toSeq: _*), lit(7)))
      .select("__s").distinct().count()
    assert(salts > 1, "hot-key rows must draw more than one salt")
  }

  test("saltedAgg equals the single-phase aggregation") {
    val plain = probe.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val salted = Skew.saltedAgg(probe, Seq("k"), salt = 7,
      partial = Seq(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx")),
      merge = Seq(sum("s").as("s"), sum("n").as("n"), max("mx").as("mx")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(salted == plain)
  }
}
