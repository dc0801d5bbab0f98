package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines. Scale design:
  *
  *  - exact dedup is one hash-groupBy (map-side combined, AQE-coalesced);
  *  - MinHash/LSH banding turns the O(n²) near-dup search into an equi-join
  *    on (band, band-signature) — candidates shuffle only within buckets;
  *  - SimHash reduces each document to a 64-bit signature; near-dups share
  *    signatures (or differ in few bits, comparable bucket-wise);
  *  - n-gram Jaccard verifies candidate pairs exactly with a shingle
  *    explode + equi-join + group count (never a cross join);
  *  - embedding cosine near-dup uses bucketed candidate generation at scale
  *    (see Similarity.lshCosineTopK) or windowed self-join for small inputs.
  *
  * The hash primitive everywhere is md5-hex (engine-portable, so the DuckDB
  * oracle can reproduce signatures bit-for-bit).
  */
object Dedup {

  /** Exact duplicate groups by content hash of `col`: (content_hash, dup_cnt,
    * keep_id) with keep_id = the minimum id (deterministic survivor). */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("dup_cnt"), min(col(idCol)).as("keep_id"))
      .where(col("dup_cnt") > 1)

  /** MinHash signature columns h0..h(k-1): hash i of a document is
    * min over shingles of md5("<i>|<shingle>") — the classic per-permutation
    * min-wise hash, in portable hex-string space. */
  def minhashSignature(shingles: Column, k: Int): Seq[(String, Column)] =
    (0 until k).map { i =>
      s"h$i" -> array_min(transform(shingles, s => md5(concat(lit(s"$i|"), s))))
    }

  /** Per-document MinHash signatures over word-3-gram shingles; documents
    * with fewer than 3 words are excluded (no shingles). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, k: Int = 4): DataFrame = {
    val sh = TextAnalysis.wordShingles(col(textCol), 3)
    val sigs = minhashSignature(sh, k).map { case (n, c) => c.as(n) }
    df.where(size(TextAnalysis.wordShingles(col(textCol), 3)) > 0)
      .select((col(idCol) +: sigs): _*)
  }

  /** LSH banding: candidate near-dup pairs (a < b) sharing at least one of
    * the k single-hash bands. Equi-join on (band index, hash) — at scale the
    * shuffle is by bucket, never all-pairs. */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String, k: Int = 4): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, k)
    val banded = sigs.select(col(idCol).as("doc"),
      explode(array((0 until k).map(i => struct(lit(i).as("band"), col(s"h$i").as("sig"))): _*))
        .as("b"))
      .select(col("doc"), col("b.band"), col("b.sig"))
    val l = banded.select(col("doc").as("a"), col("band"), col("sig"))
    val r = banded.select(col("doc").as("b"), col("band"), col("sig"))
    l.join(r, Seq("band", "sig"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** 64-bit SimHash over word tokens: bit j of the signature is the sign of
    * sum over tokens of (bit j of md5(token) ? +1 : -1). `bits` trades
    * precision for cost (the oracle uses 16). Returns (id, simhash). */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 64): DataFrame = {
    val toks = TextAnalysis.words(col(textCol))
    // bit j of a token = bit (3 - j%4) of hex digit j/4 of its md5
    def tokenBit(tok: Column, j: Int): Column = {
      val digit = substring(md5(tok), j / 4 + 1, 1)
      val v = (instr(lit("0123456789abcdef"), digit) - 1).cast("int")
      v.bitwiseAND(1 << (3 - j % 4)).notEqual(0)
    }
    val bitCols = (0 until bits).map { j =>
      val contrib = aggregate(toks, lit(0),
        (acc, tk) => acc + when(tokenBit(tk, j), 1).otherwise(-1))
      when(contrib > 0, lit(1L << (bits - 1 - j))).otherwise(lit(0L))
    }
    df.select(col(idCol), bitCols.reduce(_ + _).as("simhash"))
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing at least one
    * shingle: |A∩B| / |A|+|B|-|A∩B| via shingle-set explode + equi-join.
    * Returns pairs (a, b, jaccard) with a < b and jaccard >= minSim. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, minSim: Double = 0.5): DataFrame = {
    val withSets = df
      .select(col(idCol).as("doc"), array_distinct(TextAnalysis.wordShingles(col(textCol), n)).as("sh"))
      .where(size(col("sh")) > 0)
    val sizes = withSets.select(col("doc"), size(col("sh")).as("n_sh"))
    val exploded = withSets.select(col("doc"), explode(col("sh")).as("shingle"))
    val inter = exploded.select(col("doc").as("a"), col("shingle"))
      .join(exploded.select(col("doc").as("b"), col("shingle")), Seq("shingle"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc").as("a"), col("n_sh").as("na")), Seq("a"))
      .join(sizes.select(col("doc").as("b"), col("n_sh").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 4).as("jaccard"))
      .where(col("jaccard") >= minSim)
  }

  /** Embedding-cosine near-duplicate pairs among a bounded candidate set
    * (for unbounded inputs route through LSH buckets first —
    * [[Similarity.cosineBuckets]]). Returns (a, b, cos) with a < b. */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                           minCos: Double): DataFrame = {
    val l = df.select(col(idCol).as("a"), col(vecCol).as("va"))
    val r = df.select(col(idCol).as("b"), col(vecCol).as("vb"))
    l.join(r, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(Similarity.cosine(col("va"), col("vb")), 4).as("cos"))
      .where(col("cos") >= minCos)
  }
}
