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

  test("nearest_centroid matches the crossJoin+min(struct) winner bit-for-bit") {
    // the narrow kernel must agree with the shuffle shape it replaced on
    // BOTH metrics, including the (d, cid) tiebreak, across random data
    val rnd = new java.util.Random(23)
    val corpus = (0 until 300).map(i => (i.toLong,
      Array.fill(12)((rnd.nextFloat() - 0.5f) * 4f))).toDF("id", "v")
    val cents = (0 until 7).map(c => (c.toLong,
      Array.fill(12)((rnd.nextDouble() - 0.5) * 4))).toDF("cid", "centroid")
    val centArr = broadcast(cents.agg(array_sort(collect_list(
      struct($"cid", $"centroid"))).as("__cents")))

    // reference: the old crossJoin + groupBy(min(struct)) argmin
    val refL2 = {
      val d = VectorFunctions.dotNative($"dv", $"dv") -
        VectorFunctions.dotNative($"dv", $"centroid") * 2.0 +
        VectorFunctions.dotNative($"centroid", $"centroid")
      corpus.select($"id", $"v".cast("array<double>").as("dv"))
        .crossJoin(broadcast(cents))
        .select($"id", struct(d.as("d"), $"cid").as("s"))
        .groupBy("id").agg(min($"s").as("s"))
        .select($"id", $"s.d".as("d"), $"s.cid".as("cid"))
    }
    val gotL2 = corpus.select($"id", $"v".cast("array<double>").as("dv"))
      .crossJoin(broadcast(cents.agg(array_sort(collect_list(
        struct($"cid", $"centroid"))).as("__cents"))))
      .select($"id", VectorFunctions.nearestCentroidL2($"dv", $"__cents").as("s"))
      .select($"id", $"s.d".as("d"), $"s.cid".as("cid"))
    val jl = refL2.join(gotL2.withColumnRenamed("d", "d2")
      .withColumnRenamed("cid", "cid2"), Seq("id")).collect()
    assert(jl.length == 300)
    jl.foreach { r =>
      assert(r.getAs[Long]("cid") == r.getAs[Long]("cid2"), s"L2 cid: $r")
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("d")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("d2")), s"L2 d: $r")
    }

    val refCos = {
      val cosRef = corpus.crossJoin(broadcast(cents))
        .select($"id",
          struct((-VectorFunctions.cosineNative($"v", $"centroid")).as("nc"),
            $"cid").as("s"))
        .groupBy("id").agg(min($"s").as("s"))
        .select($"id", $"s.nc".as("d"), $"s.cid".as("cid"))
      cosRef
    }
    val gotCos = corpus.crossJoin(centArr)
      .select($"id", VectorFunctions.nearestCentroidNegCos($"v", $"__cents").as("s"))
      .select($"id", $"s.d".as("d"), $"s.cid".as("cid"))
    val jc = refCos.join(gotCos.withColumnRenamed("d", "d2")
      .withColumnRenamed("cid", "cid2"), Seq("id")).collect()
    assert(jc.length == 300)
    jc.foreach { r =>
      assert(r.getAs[Long]("cid") == r.getAs[Long]("cid2"), s"cos cid: $r")
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("d")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("d2")), s"cos d: $r")
    }
  }

  test("int8_scale matches the max(abs)/127 aggregate it replaced") {
    val rnd = new java.util.Random(41)
    val df = (0 until 200).map(i => (i.toLong,
      Array.fill(16)((rnd.nextDouble() - 0.5) * 8))).toDF("id", "v")
    val ref = df.select($"id", posexplode($"v").as(Seq("pos", "x")))
      .groupBy("id").agg((max(abs($"x")) / 127.0).as("scale"))
    val got = df.select($"id", VectorFunctions.int8Scale($"v").as("scale2"))
    ref.join(got, Seq("id")).collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("scale")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("scale2")), s"$r")
    }
    // all-zero vector -> scale 0; null vector -> null; null elements skipped
    val edge = Seq(
      (0L, Some(Array(0.0, 0.0))),
      (1L, None),
      (2L, Some(Array(-3.0, 1.0)))).toDF("id", "v")
      .select($"id", VectorFunctions.int8Scale($"v").as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(edge(0L).contains(0.0) && edge(1L).isEmpty &&
      edge(2L).contains(3.0 / 127.0))
  }

  test("cov_matrix aggregate matches the explode+decimal-sum plan bit-for-bit") {
    // random data INCLUDING ragged lengths and null elements — the fused
    // one-pass aggregate must reproduce the exact decimal quantization,
    // per-cell counts and means of the d(d+1)/2-explode plan it replaced
    val rnd = new java.util.Random(59)
    val rows = (0 until 120).map { i =>
      val d = if (i % 17 == 0) 5 else 8
      (i.toLong, Array.tabulate(d)(j =>
        if (i % 23 == 0 && j == 2) null
        else java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * 6)))
    }
    val df = rows.toDF("id", "v")
      .select($"id", $"v".cast("array<double>").as("__v"))

    val ref = {
      val pairs = df.select(explode(expr(
          """flatten(transform(__v, (x, i) ->
            |  transform(slice(__v, i + 1, size(__v) - i), (y, kk) ->
            |    struct(i AS i, i + kk AS j, x * y AS p))))""".stripMargin)).as("e"))
        .select($"e.i".cast("long").as("i"), $"e.j".cast("long").as("j"), $"e.p".as("p"))
        .groupBy("i", "j")
        .agg(count(lit(1)).as("n"), sum($"p".cast("decimal(30,10)")).as("sxy"))
      val means = df.select(posexplode($"__v").as(Seq("d", "x")))
        .groupBy($"d".cast("long").as("d"))
        .agg(count(lit(1)).as("n"), sum($"x".cast("decimal(30,10)")).as("sx"))
      (pairs.collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDecimal(3))).toMap,
        means.collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDecimal(2))).toMap)
    }
    val got = df.agg(graft.functions.CovMatrix.covMatrix($"__v").as("m"))
      .select(explode($"m.cells").as("c")).collect()
      .map(r => { val c = r.getStruct(0)
        (c.getLong(0), c.getLong(1)) -> (c.getLong(2), c.getDecimal(3)) }).toMap
    val gotDims = df.agg(graft.functions.CovMatrix.covMatrix($"__v").as("m"))
      .select(explode($"m.dims").as("c")).collect()
      .map(r => { val c = r.getStruct(0)
        c.getLong(0) -> (c.getLong(1), c.getDecimal(2)) }).toMap

    assert(got.keySet == ref._1.keySet)
    got.foreach { case (k, (n, s)) =>
      val (rn, rs) = ref._1(k)
      assert(n == rn, s"cell $k count: $n vs $rn")
      assert(s.compareTo(rs) == 0, s"cell $k sum: $s vs $rs")
    }
    assert(gotDims.keySet == ref._2.keySet)
    gotDims.foreach { case (k, (n, s)) =>
      val (rn, rs) = ref._2(k)
      assert(n == rn && s.compareTo(rs) == 0, s"dim $k: ($n, $s) vs ($rn, $rs)")
    }
    // partition-order independence of the fused aggregate
    val p1 = df.repartition(1).agg(graft.functions.CovMatrix.covMatrix($"__v"))
      .head().toString
    val p8 = df.repartition(8).agg(graft.functions.CovMatrix.covMatrix($"__v"))
      .head().toString
    assert(p1 == p8)
  }

  test("centered_projection matches the groupBy decimal-sum projection bit-for-bit") {
    val rnd = new java.util.Random(67)
    val d = 10
    val p = 3
    val vecs = (0 until 150).map(i => (i.toLong,
      Array.fill(d)((rnd.nextDouble() - 0.5) * 4))).toDF("id", "v")
      .select($"id", $"v".cast("array<double>").as("__v"))
    val meansRows = (0 until d).map(i => (i.toLong, (rnd.nextDouble() - 0.5)))
    val loadRows = for (k <- 0 until p; i <- 0 until d)
      yield (k.toLong, i.toLong, rnd.nextDouble() - 0.5)
    val means = meansRows.toDF("d", "mean")
    val loads = loadRows.toDF("component", "d", "loading")

    // reference: the explode + broadcast joins + groupBy(id, component)
    // decimal aggregation pcaProject used before round 10
    val ref = vecs.select($"id", posexplode($"__v").as(Seq("d", "x")))
      .withColumn("d", $"d".cast("long"))
      .join(broadcast(means), Seq("d"))
      .join(broadcast(loads), Seq("d"))
      .groupBy("id", "component")
      .agg(sum((($"x" - $"mean") * $"loading").cast("decimal(30,10)")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDecimal(2)).toMap

    val meansArr = broadcast(means
      .agg(array_sort(collect_list(struct($"d", $"mean"))).as("ms"))
      .select(transform($"ms", x => x.getField("mean")).as("__means")))
    val loadArr = broadcast(loads.groupBy("component")
      .agg(array_sort(collect_list(struct($"d", $"loading"))).as("ls"))
      .select($"component", transform($"ls", x => x.getField("loading")).as("__l"))
      .agg(array_sort(collect_list(struct($"component", $"__l"))).as("__loads")))
    val got = vecs.crossJoin(meansArr).crossJoin(loadArr)
      .select($"id", explode(graft.functions.CenteredProjection
        .centeredProjection($"__v", $"__means", $"__loads")).as("e"))
      .select($"id", $"e.component".as("component"), $"e.s".as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDecimal(2)).toMap

    assert(got.keySet == ref.keySet)
    got.foreach { case (k, s) =>
      assert(s.compareTo(ref(k)) == 0, s"$k: $s vs ${ref(k)}") }
  }

  test("nearest_centroid edge cases: ties, NaN centroids, nulls, interpreted path") {
    val dup = Seq((0L, Array(1.0, 0.0))).toDF("id", "v")
    // two centroids at the SAME point -> equal distance, smallest cid wins
    val tie = Seq((5L, Array(3.0, 0.0)), (2L, Array(3.0, 0.0)))
      .toDF("cid", "centroid")
      .agg(array_sort(collect_list(struct($"cid", $"centroid"))).as("cs"))
    val w = dup.crossJoin(broadcast(tie))
      .select(VectorFunctions.nearestCentroidL2($"v", $"cs").as("s")).head()
    assert(w.getStruct(0).getLong(1) == 2L)

    // a zero-norm centroid scores NaN cosine -> compares largest, never
    // beats a real candidate
    val withZero = Seq((0L, Array(0.0, 0.0)), (1L, Array(0.0, 2.0)))
      .toDF("cid", "centroid")
      .agg(array_sort(collect_list(struct($"cid", $"centroid"))).as("cs"))
    val wz = dup.crossJoin(broadcast(withZero))
      .select(VectorFunctions.nearestCentroidNegCos($"v", $"cs").as("s")).head()
    assert(wz.getStruct(0).getLong(1) == 1L)

    // null vector / empty centroid set -> null result
    val nullVec = Seq(Tuple1(Option.empty[Array[Double]])).toDF("v")
      .crossJoin(broadcast(tie))
      .select(VectorFunctions.nearestCentroidL2($"v", $"cs").as("s")).head()
    assert(nullVec.isNullAt(0))
    val emptyCents = dup
      .withColumn("cs", expr(
        "CAST(array() AS array<struct<cid: bigint, centroid: array<double>>>)"))
      .select(VectorFunctions.nearestCentroidL2($"v", $"cs").as("s")).head()
    assert(emptyCents.isNullAt(0))

    // a mismatched-length candidate is skipped, not a poison pill
    val mixed = Seq((0L, Array(9.0)), (1L, Array(0.0, 2.0)))
      .toDF("cid", "centroid")
      .agg(array_sort(collect_list(struct($"cid", $"centroid"))).as("cs"))
    val wm = dup.crossJoin(broadcast(mixed))
      .select(VectorFunctions.nearestCentroidL2($"v", $"cs").as("s")).head()
    assert(wm.getStruct(0).getLong(1) == 1L)

    // interpreted (non-codegen) eval path agrees with codegen
    val prevWs = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val prevFm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val wi = dup.crossJoin(broadcast(tie))
        .select(VectorFunctions.nearestCentroidL2($"v", $"cs").as("s")).head()
      assert(wi.getStruct(0).getLong(1) == 2L)
    } finally {
      prevWs match {
        case Some(v) => spark.conf.set("spark.sql.codegen.wholeStage", v)
        case None => spark.conf.unset("spark.sql.codegen.wholeStage")
      }
      prevFm match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
