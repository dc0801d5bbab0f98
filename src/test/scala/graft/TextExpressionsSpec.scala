package graft

import org.apache.spark.sql.functions._

/** The fused shingle kernel must be bit-identical to the composable
  * Spark-functions formulation it replaced:
  * split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")
  * joined into n-grams. */
class TextExpressionsSpec extends SparkSuite {

  // the pre-kernel reference formulation, interpreted HOFs and all
  private def referenceShingles(text: String, n: Int): Seq[String] = {
    val norm = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
    val w = if (norm.isEmpty) Seq("") else norm.split(" ").toSeq
    if (w.length < n) Seq.empty
    else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" "))
  }

  test("kernel equals the regex/split reference on edge cases") {
    val cases = Seq(
      "the quick brown fox", "  padded   runs\t\tof   space ", "",
      "!!!", "a", "a b", "a b c", "ONE two THREE four",
      "digits 123 mix4ed a1b2", "trailing punct...", "...leading",
      "unicode İstanbul straße Ñandú", "emoji 🙂 split", "tab\tsep\nnewline",
      " açaí über naïve", "ALL CAPS RUN", "x" * 500,
      (1 to 50).map(i => s"w$i").mkString(" "))
    for (n <- 1 to 4; c <- cases) {
      val viaKernel = spark.range(1).select(
        graft.functions.TextFunctions.shinglesNative(lit(c), n).as("s"))
        .collect()(0).getSeq[String](0)
      val expect = referenceShingles(c, n)
      // the one documented divergence: all-separator text yields zero
      // words in the kernel but one empty word through split("")
      val adj = if (expect == Seq.fill(math.max(0, 1 - n + 1))("") &&
        c.replaceAll("[^a-zA-Z0-9]", "").isEmpty) Seq.empty else expect
      assert(viaKernel == adj, s"n=$n text=${c.take(40)}")
    }
  }

  test("kernel equals the reference on the documents corpus (all n in 2..5)") {
    val docs = TpchGraph.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    for (n <- 2 to 5) {
      val got = pipeline.TextAnalysis.shingleRows(
          TpchGraph.table(spark, "/root/testdata/sf0.001", "documents"),
          "doc_id", "text", n)
        .groupBy("doc_id").agg(sort_array(collect_list("shingle")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      docs.foreach { case (id, text) =>
        val expect = referenceShingles(text, n).sorted
        assert(got.getOrElse(id, Seq.empty) == expect, s"doc $id n=$n")
      }
    }
  }

  test("words kernel equals split(normalized) including the empty-string edge") {
    val cases = Seq(
      "the quick brown fox", "", "!!!", "  ", "a", "UPPER lower 123",
      "unicode İstanbul straße Ñandú", "tab\tsep\nnewline", "p.u,n;c:t!",
      " leading and trailing ", "a1b2c3", "🙂")
    for (c <- cases) {
      val got = spark.range(1)
        .select(graft.functions.TextFunctions.wordsNative(lit(c)).as("w"))
        .collect()(0).getSeq[String](0)
      val norm = c.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      val expect = norm.split(" ", -1).toSeq // split("", " ") == Seq("")
      assert(got == expect, s"text=${c.take(30)}")
    }
  }

  test("null text yields null, SQL surface registered") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_shingles(CAST(NULL AS STRING), 3) AS a, " +
      "graft_shingles('one two three four', 3) AS b").collect()(0)
    assert(r.isNullAt(0))
    assert(r.getSeq[String](1) == Seq("one two three", "two three four"))
  }

  test("plan stays narrow and codegen'd: no exchange, no window, no regex") {
    val docs = TpchGraph.table(spark, "/root/testdata/sf0.001", "documents")
    val sh = pipeline.TextAnalysis.shingleRows(docs, "doc_id", "text", 3)
    sh.write.mode("overwrite").format("noop").save()
    // only the plan ABOVE the cached table scan is the operator's own
    // shape; the InMemoryRelation's build plan legitimately contains the
    // one-time repartition exchange
    val plan = sh.queryExecution.executedPlan.toString.split("InMemoryTableScan").head
    assert(!plan.contains("Exchange"), s"shuffle in the shingle plan:\n$plan")
    assert(!plan.contains("Window"), s"window in the shingle plan:\n$plan")
    assert(plan.contains("graft_shingles"), s"kernel missing from plan:\n$plan")
  }
}
