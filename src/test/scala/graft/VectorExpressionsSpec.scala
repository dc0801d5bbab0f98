package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, VectorFunctions}
import graft.pipeline.Similarity

class VectorExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    (0 until n).map(i => (i.toLong,
      Array.fill(dim)((rnd.nextFloat() - 0.5f) * 4f),
      Array.fill(dim)((rnd.nextFloat() - 0.5f) * 4f)))
      .toDF("id", "a", "b")
  }

  test("native dot/cosine are bit-identical to the HOF formulation") {
    val df = randomVecs(200, 24, seed = 7)
      .select(
        VectorFunctions.dotNative($"a", $"b").as("dn"),
        Similarity.dotHof($"a", $"b").as("dh"),
        VectorFunctions.cosineNative($"a", $"b").as("cn"),
        Similarity.cosineHof($"a", $"b").as("ch"))
      .collect()
    df.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"dot differs: $r")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), s"cosine differs: $r")
    }
  }

  test("null semantics match the HOF composition") {
    val cases = Seq(
      (1L, Array(1.0, 2.0), Array(3.0, 4.0)),   // plain
      (2L, Array(1.0, 2.0), Array(3.0)),        // length mismatch -> null
      (3L, Array[Double](), Array[Double]())    // empty -> dot 0.0, cosine NaN
    ).toDF("id", "a", "b")
    val both = cases.select($"id",
      VectorFunctions.dotNative($"a", $"b").as("dn"),
      Similarity.dotHof($"a", $"b").as("dh"),
      VectorFunctions.cosineNative($"a", $"b").as("cn"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(both(1L)._1 == both(1L)._2)
    assert(both(2L) == ((None, None, None)))
    assert(both(3L)._1.contains(0.0) && both(3L)._2.contains(0.0))
    // zero-norm input: the native cosine yields IEEE NaN; the HOF divide
    // under ANSI mode (Spark 4 default) would instead throw DIVIDE_BY_ZERO
    assert(both(3L)._3.exists(v => v.asInstanceOf[Double].isNaN))
    intercept[Exception] {
      cases.where($"id" === 3).select(Similarity.cosineHof($"a", $"b")).collect()
    }
    // a null element poisons the whole result, like the HOF fold
    val withNullElem = Seq((1L, Seq(Some(1.0), None, Some(2.0)), Seq(Some(1.0), Some(1.0), Some(1.0))))
      .toDF("id", "a", "b")
      .select(VectorFunctions.dotNative($"a", $"b").as("dn"),
        Similarity.dotHof($"a", $"b").as("dh"))
      .head()
    assert(withNullElem.isNullAt(0) && withNullElem.isNullAt(1))
  }

  test("generated code path runs with codegen fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val out = randomVecs(50, 16, seed = 11)
        .select(VectorFunctions.cosineNative($"a", $"b").as("c"))
        .agg(count($"c")).head().getLong(0)
      assert(out == 50)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("SQL registration: graft_cosine and graft_dot callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c, " +
        "graft_dot(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS d").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 10.0)
    // arity misuse is rejected
    intercept[Exception] { spark.sql("SELECT graft_dot(array(1.0D))").collect() }
  }

  test("kmv distinct: exact below k, ~accurate above, partition-invariant") {
    import graft.functions.KmvDistinct.kmvDistinct
    import spark.implicits._
    // below k: the estimate IS the exact distinct count
    val small = Seq("a", "b", "c", "a", "b").toDF("v")
    assert(small.agg(kmvDistinct(col("v"), 64)).head.getDouble(0) == 3.0)
    // above k: within 15% of the true cardinality
    val big = spark.range(20000).select(concat(lit("x"), col("id") % 10000).as("v"))
    val est = big.agg(kmvDistinct(col("v"), 256)).head.getDouble(0)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.15, s"estimate $est off >15%")
    // deterministic across partitionings (merge path exercised)
    val est1 = big.repartition(1).agg(kmvDistinct(col("v"), 256)).head.getDouble(0)
    val est8 = big.repartition(8).agg(kmvDistinct(col("v"), 256)).head.getDouble(0)
    assert(est1 == est8 && est1 == est)
    // grouped: per-group sketches are independent
    val grouped = spark.range(3000)
      .select((col("id") % 3).as("g"), concat(lit("v"), col("id")).as("v"))
      .groupBy("g").agg(kmvDistinct(col("v"), 64).as("est"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    grouped.values.foreach(e => assert(math.abs(e - 1000.0) / 1000.0 < 0.3))
    // nulls are skipped, not counted
    val withNull = Seq(Some("a"), None, Some("b")).toDF("v")
    assert(withNull.agg(kmvDistinct(col("v"), 8)).head.getDouble(0) == 2.0)
  }

  test("int and long element arrays widen like the cast-based HOF") {
    val df = Seq((Array(1, 2, 3), Array(4L, 5L, 6L))).toDF("a", "b")
      .select(VectorFunctions.dotNative($"a", $"b").as("dn"),
        Similarity.dotHof($"a", $"b").as("dh"))
      .head()
    assert(df.getDouble(0) == 32.0 && df.getDouble(1) == 32.0)
  }
}
