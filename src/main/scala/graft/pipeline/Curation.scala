package graft.pipeline

import org.apache.spark.graphx.{Edge, Graph => XGraph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: survivor
  * selection, duplicate clustering, deterministic sampling/splits,
  * pattern redaction, vocabulary statistics.
  *
  * Determinism rule: every sampling/split decision hashes the record id
  * with md5 and compares hex prefixes — portable across engines (the DuckDB
  * oracle reproduces it exactly) and stable across runs/partitionings.
  */
object Curation {

  /** Deduplicated corpus: one survivor (minimum id) per exact content
    * group. One hash-groupBy + one equi-join — no all-pairs work. */
  def dedupExactKeepFirst(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = df.groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Duplicate clusters from a candidate-pair list (a, b numeric ids):
    * connected components over the pair graph (GraphX), cluster id = the
    * minimum member id. Returns (id, cluster) for every id in some pair. */
  def dupClusters(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val parts = math.max(2, math.min(
      spark.sparkContext.defaultParallelism,
      (pairs.count() / 1000000L).toInt + 1))
    val edges = pairs.select(col("a").cast("long"), col("b").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1)).coalesce(parts)
    val cc = XGraph.fromEdges(edges, defaultValue = 0)
      .connectedComponents().vertices
      .map { case (vid, comp) => (vid, comp) }
      .toDF("id", "cluster")
    cc
  }

  /** Deterministic ~(keepOf256/256) sample: keep rows whose md5 bucket of
    * the seeded id is below the threshold. */
  def sampleByHash(df: DataFrame, idCol: String, keepOf256: Int, seed: String = "s"): DataFrame =
    df.where(substring(md5(concat(lit(seed + "|"), col(idCol).cast("string"))), 1, 2)
      < lit(f"$keepOf256%02x"))

  /** Deterministic train/val/test split label: test = first testOf256
    * buckets, val = next valOf256, train = the rest. */
  def splitLabel(df: DataFrame, idCol: String,
                 testOf256: Int = 13, valOf256: Int = 13, seed: String = "split"): DataFrame = {
    val b = substring(md5(concat(lit(seed + "|"), col(idCol).cast("string"))), 1, 2)
    df.withColumn("split",
      when(b < lit(f"$testOf256%02x"), "test")
        .when(b < lit(f"${testOf256 + valOf256}%02x"), "val")
        .otherwise("train"))
  }

  /** Pattern redaction: emails and long digit runs replaced with typed
    * placeholder tokens (codegen'd regexp passes, linear per row). */
  def redact(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{6,}", "<NUM>")

  /** Corpus vocabulary: per token, document frequency and term frequency
    * (one explode + one aggregation, map-side combined). */
  def vocabulary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextAnalysis.tokenRows(df, idCol, textCol)
      .where(col("word") =!= "")
      .groupBy("word")
      .agg(countDistinct(col(idCol)).as("doc_freq"), count(lit(1)).as("term_freq"))

  /** Benchmark decontamination: corpus documents that share NO word n-gram
    * with the benchmark/eval set (the standard guard against train-test
    * leakage in LLM training pipelines — documents containing any
    * benchmark n-gram are dropped entirely).
    *
    * Scale design: benchmark suites are tiny relative to a training corpus,
    * so the distinct benchmark gram set is `broadcast` to every executor
    * and corpus grams probe it map-side (left-semi) — the corpus text is
    * shuffled only once, by document id, to assemble its shingles; no
    * shuffle is keyed on the gram itself, so boilerplate grams cannot skew
    * a partition. Documents with fewer than n words carry no n-gram and
    * always survive. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int = 8): DataFrame =
    corpus.join(contaminationHits(corpus, benchmark, idCol, textCol, n)
      .select(idCol), Seq(idCol), "left_anti")

  /** Contamination report behind [[decontaminate]]: per contaminated corpus
    * document, the number of DISTINCT n-grams it shares with the benchmark
    * set (docs with zero hits are absent). */
  def contaminationHits(corpus: DataFrame, benchmark: DataFrame,
                        idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val benchGrams = TextAnalysis.shingleRows(benchmark, idCol, textCol, n)
      .select("shingle").distinct()
    TextAnalysis.shingleRows(corpus, idCol, textCol, n)
      .dropDuplicates(idCol, "shingle")
      .join(broadcast(benchGrams), Seq("shingle"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }
}
