package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding quantization for storage/serving-scale vector pipelines:
  * symmetric per-vector int8 codes (the layout faiss-style scalar
  * quantizers and int8 ONNX embeddings use — 4× smaller than float32,
  * 8× smaller than float64, dot products stay integer until the final
  * per-pair rescale).
  *
  * Every step is engine-portable: the scale is an exact IEEE division of
  * the vector's max-abs by 127, and codes are floor(x/scale + 0.5) — floor
  * is deterministic for every double, unlike round-half-* conventions that
  * differ between engines.
  *
  * Scale design (round 10): per-vector statistics are ROW-LOCAL — the
  * scale comes from the codegen'd [[graft.functions.Int8Scale]] kernel and
  * the PQ codeword argmin folds in [[graft.functions.NearestCentroid]]
  * over the broadcast codebook, so quantization is a pure corpus scan with
  * ZERO id-keyed exchanges (the old long-form posexplode → groupBy(id)
  * shapes shuffled the corpus twice). 100 TB of vectors is a linear scan.
  */
object Quantization {

  /** (id, pos, code, scale) long form: one row per vector element with its
    * symmetric int8 code and the per-vector scale.
    * `dequantized(pos) = code * scale`; an all-zero vector quantizes to
    * scale 0 with all-zero codes. This is the canonical scan-shaped output
    * (every column scalar — joins, verification dumps, and columnar sinks
    * consume it directly); [[int8]] packs it back per vector.
    *
    * The scale is a ROW-LOCAL statistic, computed by the codegen'd
    * [[graft.functions.Int8Scale]] kernel in the projection BELOW the
    * explode — the old posexplode → groupBy(id) → join-back shape paid two
    * corpus-keyed exchanges for it; this plan has zero. The two-select
    * split keeps the scale evaluated once per VECTOR (an attribute under
    * the Generate), not once per exploded element. */
  /** Int8 quantization-loss recall: cosine top-k served from the int8
    * RECONSTRUCTION (code·scale per dimension, full-precision queries —
    * the asymmetric serving shape) measured against the exact float
    * ground truth. The acceptance test for shipping int8 vectors on the
    * serving tier — the precision-truncation twin of
    * [[Similarity.matryoshkaRecall]]'s dimension truncation.
    *
    * Scale: reconstruction is row-local (the [[graft.functions.Int8Scale]]
    * kernel + one transform — a pure corpus scan); ground truth is
    * checkpointed once; the served arm is one broadcast-query scan over
    * the reconstructed corpus. Returns one row
    * (n_queries, n_exact, n_found, n_hit, recall). */
  def int8Recall(corpus: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame = {
    val exact = Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val den = exact.agg(countDistinct("query_id").as("n_queries"),
      count(lit(1)).as("n_exact"))
    val recon = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .select(col(idCol), col("__v"),
        graft.functions.VectorFunctions.int8Scale(col("__v")).as("__scale"))
      .select(col(idCol),
        when(col("__scale") === 0.0, transform(col("__v"), _ => lit(0.0)))
          .otherwise(transform(col("__v"),
            x => floor(x / col("__scale") + 0.5) * col("__scale"))).as(vecCol))
    val q = queries.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
    val served = Similarity.bruteForceTopK(recon, q, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = served
      .join(exact.withColumn("__hit", lit(1L)), Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_found"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
    hits.crossJoin(broadcast(den))
      .select(col("n_queries"), col("n_exact"), col("n_found"),
        col("n_hit").cast("long").as("n_hit"),
        round(when(col("n_exact") === 0, 1.0)
          .otherwise(col("n_hit").cast("double") / col("n_exact")), 4).as("recall"))
  }

  def int8Rows(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .select(col(idCol),
        graft.functions.VectorFunctions.int8Scale(col("__v")).as("scale"),
        col("__v"))
      .select(col(idCol), col("scale"),
        posexplode(col("__v")).as(Seq("pos", "val")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        when(col("scale") === 0.0, lit(0L))
          .otherwise(floor(col("val") / col("scale") + 0.5)).as("code"),
        col("scale"))

  /** Product quantization (the faiss PQ layout): each vector is split into
    * `m` equal sub-vectors and every sub-vector is replaced by the id of
    * its nearest codeword in that subspace's codebook — m small codes per
    * vector instead of the full float array, the standard
    * memory-versus-recall trade for billion-scale ANN.
    *
    * The codebook is STATIC and data-derived with no fitted state: subspace
    * s's codewords are the s-th sub-vectors of the `k` smallest-id vectors
    * (the same deterministic-quantizer convention as
    * [[Similarity.ivfTopK]]; swap in per-subspace k-means for production —
    * the plan shape is identical). Distances use the same
    * `v·v − 2 v·c + c·c` expression as [[Clustering]], ties break to the
    * smallest codeword id, so an oracle replays the encoding exactly.
    *
    * Scale: the codebook (m × k rows) is broadcast as one per-subspace
    * map row; the corpus is scanned once into m sub-vector rows and the
    * codeword argmin folds ROW-LOCALLY in the codegen'd NearestCentroid
    * kernel — zero corpus exchanges, nothing shuffles all-pairs or sorts.
    * Vectors whose length is not a multiple of m drop the trailing
    * remainder elements from every computation (caller pads if that
    * matters). Returns (id, sub, code, err2) where err2 is the squared L2
    * residual to the chosen codeword, rounded to 6 decimals. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               m: Int = 4, k: Int = 16): DataFrame = {
    require(k > 0, s"need k > 0; got $k")
    val sv = subVectors(df, idCol, vecCol, m)
    // per-subspace codeword arrays collected into ONE broadcast map row
    // (m keys × k cid-sorted structs); the codeword argmin then folds
    // ROW-LOCALLY in the NearestCentroid kernel (identical
    // v·v − 2 v·c + c·c fold and smallest-cid tiebreak as the old
    // min(struct) aggregation) — the (id, sub)-keyed corpus exchange is
    // gone; the corpus-side plan is explode + projection only
    val cbMap = broadcast(pqCodebook(df, idCol, vecCol, m, k)
      .groupBy("s")
      .agg(array_sort(collect_list(struct(col("cid"), col("cw").as("centroid"))))
        .as("__cents"))
      .agg(map_from_entries(collect_list(struct(col("s"), col("__cents"))))
        .as("__cb")))
    sv.crossJoin(cbMap)
      .select(col(idCol), col("s"),
        graft.functions.VectorFunctions
          .nearestCentroidL2(col("x"), element_at(col("__cb"), col("s")))
          .as("__w"))
      .where(col("__w").isNotNull)
      .select(col(idCol), col("s").cast("long").as("sub"),
        col("__w.cid").as("code"), round(col("__w.d"), 6).as("err2"))
  }

  /** Long-form sub-vectors (id, s, x): each vector split into `m` equal
    * slices (trailing remainder elements dropped when the length is not a
    * multiple of m — identical convention in every consumer). */
  def subVectors(df: DataFrame, idCol: String, vecCol: String, m: Int): DataFrame = {
    require(m > 0, s"need m > 0; got $m")
    val v = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__d", expr(s"size(__v) DIV $m"))
    val subs = array((0 until m).map(s => struct(lit(s).as("s"),
      slice(col("__v"), lit(s) * col("__d") + 1, col("__d")).as("x"))): _*)
    v.select(col(idCol), explode(subs).as("b"))
      .select(col(idCol), col("b.s").as("s"), col("b.x").as("x"))
  }

  /** Static PQ codebook (s, cid, cw): subspace s's codewords are the s-th
    * sub-vectors of the `k` smallest-id vectors (requires a numeric id). */
  def pqCodebook(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int): DataFrame =
    subVectors(df.where(col(idCol) < k), idCol, vecCol, m)
      .select(col("s"), col(idCol).cast("long").as("cid"), col("x").as("cw"))

  /** Squared L2 between a sub-vector `x` and a codeword `cw` — the same
    * `v·v − 2 v·c + c·c` expression shape as [[Clustering]]'s assignment,
    * so every PQ consumer (and its oracle) scores identically. */
  private def subDist: org.apache.spark.sql.Column = {
    import graft.functions.VectorFunctions.dotNative
    dotNative(col("x"), col("x")) -
      dotNative(col("x"), col("cw")) * 2.0 +
      dotNative(col("cw"), col("cw"))
  }

  /** ANN top-k over PQ codes with ASYMMETRIC distance (ADC, the faiss
    * search path): the corpus is represented only by its m codes per
    * vector; a query precomputes its distance to every codeword (an
    * m × k table) and a corpus vector's distance is the SUM of the m
    * table lookups its codes select. Per-sub distances are quantized to
    * integer micro-units before that sum (exact integer aggregation —
    * a double sum would depend on partition order; same device as
    * [[TextAnalysis.bm25TopK]]).
    *
    * Scale: the ADC table (queries × m × k rows) is broadcast; the
    * encoded corpus joins it on (sub, code) and reduces with one
    * map-side-combinable sum per (query, vector). The corpus' float
    * vectors are read only by the one-time encoding — at serving scale
    * the codes are the stored representation and the scan is 4 bytes of
    * codes per vector instead of the full embedding.
    * Returns (query_id, neighbor_id, dist, rank) ranked by ADC distance
    * ascending, ties to the smaller neighbor id. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, m: Int = 4, codewords: Int = 16): DataFrame = {
    require(k > 0, s"need k > 0; got $k")
    val cb = pqCodebook(corpus, idCol, vecCol, m, codewords)
    val qs = subVectors(queries, idCol, vecCol, m)
      .select(col(idCol).as("query_id"), col("s"), col("x"))
    val adc = qs.join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s").cast("long").as("sub"), col("cid").as("code"),
        floor(subDist * 1000000.0 + 0.5).cast("long").as("__micro"))
    val dists = pqEncode(corpus, idCol, vecCol, m, codewords)
      .select(col(idCol).as("neighbor_id"), col("sub"), col("code"))
      .join(broadcast(adc), Seq("sub", "code"))
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("__micro")).as("__micros"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__micros").asc, col("neighbor_id").asc)
    dists.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        (floor(col("__micros").cast("double") / 100.0 + 0.5).cast("double") / 10000.0)
          .as("dist"),
        col("rank").cast("long").as("rank"))
  }

  /** IVF-PQ ANN top-k (the faiss IVFPQ architecture, RESIDUAL encoding):
    * vectors are routed into `nlist` inverted lists by cosine to a FITTED
    * coarse quantizer (`iters` Lloyd steps from the min-id seeds —
    * [[Clustering.kmeansCentroids]]); each vector is PQ-encoded on
    * its RESIDUAL to the assigned centroid (the faiss-standard refinement
    * — residuals concentrate near the origin, so the same codebook budget
    * spends its resolution where the vectors actually live); queries probe
    * their `nprobe` nearest lists and score candidates with the ASYMMETRIC
    * distance of the QUERY residual per probed list against the codewords.
    *
    * The residual never materializes on the corpus scan: dist(x − c, cw)
    * expands to x·x − 2x·c + c·c − 2(x·cw − c·cw) + cw·cw, all codegen'd
    * dot products of raw sub-slices ([[resSubDist]]). The residual
    * CODEBOOK is static and SQL-replayable: the residual sub-vectors of
    * ids [nlist, nlist+codewords) — deliberately DISJOINT from the
    * centroid source ids [0, nlist), whose residuals are ~0 and would
    * collapse the codebook into degeneracy.
    *
    * Scale: centroid sub-vectors, the residual codebook, the probe map,
    * and the per-(query, list) ADC tables are broadcast; the corpus-sized
    * inputs (assignment + sub-vector scan) join on id and reduce with one
    * map-side-combinable min/sum. Returns (query_id, neighbor_id, dist,
    * rank) — dist is the ADC estimate of the squared L2 between residual
    * and codeword chain, ascending, ties to the smaller neighbor id. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                k: Int, nlist: Int = 16, nprobe: Int = 8,
                m: Int = 16, codewords: Int = 256, iters: Int = 2): DataFrame = {
    val (cent, resCb) = ivfPqIndex(corpus, idCol, vecCol, nlist, m, codewords, iters)
    ivfPqTopKWith(corpus, queries, idCol, vecCol, k, nprobe, m, cent, resCb)
  }

  /** Build the trained IVF-PQ INDEX — the production lifecycle splits
    * here: the index (fitted coarse centroids + Lloyd-trained residual
    * codebooks, both eval-sized and returned MATERIALIZED) is built once
    * per corpus and served by every subsequent [[ivfPqTopKWith]] call.
    *
    * FITTED coarse quantizer (Lloyd, decimal-sum determinism): residual
    * encoding only concentrates residuals near the origin when the coarse
    * centroids actually sit at the data's centers — against a static
    * min-id "quantizer" the residuals are as spread as the raw vectors
    * and residual PQ measurably UNDERPERFORMS (observed 0.04 vs 0.11
    * recall@3 at sf0.1); with the fitted quantizer it beats raw-static.
    * Residual codebook seeds come from ids [nlist, nlist+codewords) —
    * disjoint from the centroid seeds, whose ~0 residuals would
    * degenerate the codebook. Returns (centroids (lcid, centroid),
    * codebooks (s, cid, cw)). */
  def ivfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 nlist: Int = 16, m: Int = 16, codewords: Int = 256,
                 iters: Int = 2): (DataFrame, DataFrame) = {
    val cent = Clustering
      .kmeansCentroids(corpus.select(col(idCol), col(vecCol)), idCol, vecCol, nlist, iters)
      .select(col("cid").cast("long").as("lcid"), col("centroid"))
      .localCheckpoint(true)
    val centSub = broadcast(subVectors(
        cent.select(col("lcid"), col("centroid")), "lcid", "centroid", m)
      .select(col("lcid").cast("long").as("lcid"), col("s"), col("x").as("c")))
    val resCb = trainResidualCodebooks(subVectors(corpus, idCol, vecCol, m),
      listAssign(corpus, idCol, vecCol, cent), centSub, idCol, nlist, codewords, iters)
    (cent, resCb)
  }

  /** Corpus → inverted-list assignment: argmax-cosine folded ROW-LOCALLY
    * over the broadcast centroid array by the codegen'd
    * [[graft.functions.NearestCentroid]] kernel — a narrow projection with
    * zero exchanges (the old min(struct) aggregation still shuffled one
    * winner row per vector); the n×nlist expansion never exists as rows. */
  private def listAssign(corpus: DataFrame, idCol: String, vecCol: String,
                         cent: DataFrame): DataFrame = {
    val centArr = broadcast(cent
      .select(col("lcid").cast("long").as("cid"), col("centroid"))
      .agg(array_sort(collect_list(struct(col("cid"), col("centroid"))))
        .as("__cents")))
    corpus.select(col(idCol).as("__vid"), col(vecCol).as("cv"))
      .crossJoin(centArr)
      .select(col("__vid"),
        graft.functions.VectorFunctions
          .nearestCentroidNegCos(col("cv"), col("__cents"))
          .getField("cid").as("lcid"))
      .where(col("lcid").isNotNull)
  }

  /** Serve ANN top-k from a prebuilt [[ivfPqIndex]]: encode the corpus
    * codes in-line ([[ivfPqEncode]] — same accounting as the raw-PQ
    * rounds), then search them ([[ivfPqSearchCodes]]). A production
    * deployment persists the codes beside the index and serves from the
    * stored codes alone — [[AnnIndex]] is that lifecycle. */
  def ivfPqTopKWith(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                    k: Int, nprobe: Int, m: Int,
                    centIn: DataFrame, resCbIn: DataFrame): DataFrame =
    ivfPqSearchCodes(ivfPqEncode(corpus, idCol, vecCol, m, centIn, resCbIn),
      queries, idCol, vecCol, k, nprobe, m, centIn, resCbIn)

  /** Encode the corpus into its inverted-list residual-PQ codes
    * (idCol, lcid, sub, code) — the PERSISTED representation an IVF-PQ
    * index stores: m small codes + a list id per vector instead of the
    * float embedding. One corpus scan; the min residual-ADC codeword per
    * (id, sub) is a map-side-combinable min(struct) and residuals never
    * materialize ([[resSubDist]]). */
  def ivfPqEncode(corpus: DataFrame, idCol: String, vecCol: String, m: Int,
                  centIn: DataFrame, resCbIn: DataFrame): DataFrame = {
    val resCb = broadcast(resCbIn)
    val assign = listAssign(corpus, idCol, vecCol, centIn)
    // centroid sub-vectors (nlist × m rows, broadcast)
    val centSub = broadcast(subVectors(
        centIn.select(col("lcid"), col("centroid")), "lcid", "centroid", m)
      .select(col("lcid").cast("long").as("lcid"), col("s"), col("x").as("c")))
    subVectors(corpus, idCol, vecCol, m)
      .join(assign, col(idCol) === col("__vid"))
      .join(centSub, Seq("lcid", "s"))
      .join(resCb, Seq("s"))
      .select(col(idCol), col("lcid"), col("s"),
        struct(resSubDist.as("d"), col("cid")).as("__sc"))
      .groupBy(col(idCol), col("lcid"), col("s"))
      .agg(min(col("__sc")).as("__sc"))
      .select(col(idCol), col("lcid"),
        col("s").cast("long").as("sub"), col("__sc.cid").as("code"))
  }

  /** ANN top-k over STORED codes — the serving path of a persisted index:
    * the corpus-sized input is the (idCol, lcid, sub, code) frame
    * [[ivfPqEncode]] produced (possibly read back from parquet —
    * [[AnnIndex.load]]), and the raw embeddings are never touched. Probe
    * selection and ADC tables are the same broadcast row-local shapes as
    * [[ivfPqTopKWith]]; the serving scan is m integer codes per vector. */
  def ivfPqSearchCodes(codes: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                       k: Int, nprobe: Int, m: Int,
                       centIn: DataFrame, resCbIn: DataFrame): DataFrame = {
    require(k > 0 && nprobe > 0, s"need k > 0, nprobe > 0; got k=$k nprobe=$nprobe")
    val w = org.apache.spark.sql.expressions.Window
    val resCb = broadcast(resCbIn)
    // probe selection: row-local transform+sort+slice over the broadcast
    // centroid array (no per-query aggregation shuffle; see ivfTopKWith)
    val centArr = broadcast(centIn
      .select(col("lcid").cast("long").as("cid"), col("centroid"))
      .agg(array_sort(collect_list(struct(col("cid"), col("centroid"))))
        .as("__cents")))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(centArr)
      .select(col("query_id"),
        explode(slice(array_sort(transform(col("__cents"), c =>
            struct((-Similarity.cosine(col("qv"), c.getField("centroid"))).as("nc"),
              c.getField("cid").as("lcid")))),
          1, nprobe)).as("__p"))
      .select(col("query_id"), col("__p.lcid").as("lcid"))
    // centroid sub-vectors (nlist × m rows, broadcast)
    val centSub = broadcast(subVectors(
        centIn.select(col("lcid"), col("centroid")), "lcid", "centroid", m)
      .select(col("lcid").cast("long").as("lcid"), col("s"), col("x").as("c")))
    val enc = codes.select(col(idCol).as("neighbor_id"), col("lcid"),
      col("sub"), col("code"))
    // per-(query, probed list) ADC table: the query residual against every
    // codeword, integer micro-units (queries × nprobe × m × k rows)
    val adc = subVectors(queries, idCol, vecCol, m)
      .select(col(idCol).as("query_id"), col("s"), col("x"))
      .join(probes, Seq("query_id"))
      .join(centSub, Seq("lcid", "s"))
      .join(resCb, Seq("s"))
      .select(col("query_id"), col("lcid"), col("s").cast("long").as("sub"),
        col("cid").as("code"),
        floor(resSubDist * 1000000.0 + 0.5).cast("long").as("__micro"))
    val dists = enc
      .join(broadcast(adc), Seq("lcid", "sub", "code"))
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("__micro")).as("__micros"))
    val rankW = w.partitionBy("query_id").orderBy(col("__micros").asc, col("neighbor_id").asc)
    dists.withColumn("rank", row_number().over(rankW))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        (floor(col("__micros").cast("double") / 100.0 + 0.5).cast("double") / 10000.0)
          .as("dist"),
        col("rank").cast("long").as("rank"))
  }

  /** IVF-PQ search with EXACT rerank — the faiss "refine" production
    * pattern: the ADC pass proposes `k · rerank` candidates per query
    * from the compressed codes, then ONLY those candidates' raw vectors
    * are fetched (a candidate-bounded equi-join against the corpus — at
    * 100 TB the refine reads k·rerank·|queries| rows, not the corpus)
    * and rescored with exact cosine; the top k by exact score win. Turns
    * the quantization error into a recall-only concern: any true
    * neighbor the ADC ranks within the rerank window is returned in its
    * EXACT order. Returns (query_id, neighbor_id, cos, rank) — the
    * [[Similarity.bruteForceTopK]] shape, directly comparable. */
  def ivfPqTopKRerank(corpus: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String,
                      k: Int, rerank: Int = 4, nprobe: Int = 8, m: Int = 16,
                      centIn: DataFrame, resCbIn: DataFrame): DataFrame =
    ivfPqTopKRerankCodes(ivfPqEncode(corpus, idCol, vecCol, m, centIn, resCbIn),
      corpus, queries, idCol, vecCol, k, rerank, nprobe, m, centIn, resCbIn)

  /** [[ivfPqTopKRerank]] over an ALREADY-ENCODED corpus — callers that
    * run several IVF-PQ arms over one corpus (the recall report) encode
    * once and share the codes instead of paying one corpus-scan encode
    * per arm (round 16, guide §1.2: don't compute things twice). */
  def ivfPqTopKRerankCodes(codes: DataFrame, corpus: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String,
                      k: Int, rerank: Int, nprobe: Int, m: Int,
                      centIn: DataFrame, resCbIn: DataFrame): DataFrame = {
    require(rerank >= 1, s"need rerank >= 1; got $rerank")
    val w = org.apache.spark.sql.expressions.Window
    val cand = ivfPqSearchCodes(codes, queries, idCol, vecCol,
        k * rerank, nprobe, m, centIn, resCbIn)
      .select(col("query_id"), col("neighbor_id"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val rescored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
        Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("__qv"), col("__cv")), 6).as("cos"))
    val rankW = w.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(rankW))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** Residual ADC distance dist(x − c, cw) without materializing x − c:
    * x·x − 2x·c + c·c − 2(x·cw − c·cw) + cw·cw — every term a codegen'd
    * native dot product over the raw sub-slices. Term order is pinned;
    * the DuckDB oracle replays the identical association. */
  private def resSubDist: org.apache.spark.sql.Column = {
    import graft.functions.VectorFunctions.dotNative
    dotNative(col("x"), col("x")) -
      dotNative(col("x"), col("c")) * 2.0 +
      dotNative(col("c"), col("c")) -
      (dotNative(col("x"), col("cw")) - dotNative(col("c"), col("cw"))) * 2.0 +
      dotNative(col("cw"), col("cw"))
  }

  /** Lloyd-train the per-subspace residual codebooks: seeds are the
    * residual sub-vectors of ids [nlist, nlist+codewords); each iteration
    * reassigns every corpus residual sub-vector to its nearest codeword
    * (the same [[resSubDist]] the encoder uses — residuals stay
    * unmaterialized in the distance) and recenters codewords on the mean
    * of their members. Means carry their sums in DECIMAL(30,10) so the
    * update is exact and partition-order independent — the same device as
    * [[Clustering.kmeansCentroids]], which makes the training loop
    * REPLAYABLE by the SQL oracle with unrolled iterations. Empty
    * codewords keep their previous value (coalesce). At 100 TB the
    * training input would be a sample; the encode pass is the corpus-scan
    * consumer. Returns (s, cid, cw). */
  private def trainResidualCodebooks(sv: DataFrame, assign: DataFrame,
                                     centSub: DataFrame, idCol: String,
                                     nlist: Int, codewords: Int,
                                     iters: Int): DataFrame = {
    var cb = sv.where(col(idCol) >= nlist && col(idCol) < nlist + codewords)
      .join(assign, col(idCol) === col("__vid"))
      .join(centSub, Seq("lcid", "s"))
      .select(col("s"), col(idCol).cast("long").as("cid"),
        zip_with(col("x"), col("c"), (a, b) => a - b).as("cw"))
      .localCheckpoint(true)
    if (iters > 0) {
      // residual components (id, s, pos, rval), computed once: scalar
      // subtraction against the broadcast centroid component table — no
      // higher-order lambda in the corpus-sized path
      val centComp = broadcast(centSub.select(col("lcid"), col("s"),
        posexplode(col("c")).as(Seq("pos", "cval"))))
      val rcomp = sv.join(assign, col(idCol) === col("__vid"))
        .select(col(idCol), col("lcid"), col("s"),
          posexplode(col("x")).as(Seq("pos", "xval")))
        .join(centComp, Seq("lcid", "s", "pos"))
        .select(col(idCol), col("s"), col("pos"),
          (col("xval") - col("cval")).as("rval"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        rcomp.count() // eager fill: consumed once per iteration
        (0 until iters).foreach { _ =>
          val assigned = sv
            .join(assign, col(idCol) === col("__vid"))
            .join(centSub, Seq("lcid", "s"))
            .join(broadcast(cb), Seq("s"))
            .select(col(idCol), col("s"),
              struct(resSubDist.as("d"), col("cid")).as("__sc"))
            .groupBy(col(idCol), col("s")).agg(min(col("__sc")).as("__sc"))
            .select(col(idCol), col("s"), col("__sc.cid").as("cid"))
          val means = assigned.join(rcomp, Seq(idCol, "s"))
            .groupBy("s", "cid", "pos")
            .agg(sum(col("rval").cast("decimal(30,10)")).as("sm"),
              count(lit(1)).as("n"))
            .select(col("s"), col("cid"), col("pos"),
              (col("sm").cast("double") / col("n")).as("mv"))
          val fresh = means.groupBy("s", "cid")
            .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
              x => x.getField("mv")).as("fresh"))
          cb = cb.join(fresh, Seq("s", "cid"), "left")
            .select(col("s"), col("cid"),
              coalesce(col("fresh"), col("cw")).as("cw"))
            .localCheckpoint(true)
        }
      } finally rcomp.unpersist()
    }
    cb
  }

  /** (id, scale, codes): per-vector symmetric int8 quantization with the
    * codes packed in element order — ONE narrow projection (the scale is
    * the codegen'd [[graft.functions.Int8Scale]] kernel; codes transform
    * in place), where the old collect-and-sort pack re-keyed the whole
    * corpus by id. Library surface; the oracled scan shape is
    * [[int8Rows]]. */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .select(col(idCol),
        graft.functions.VectorFunctions.int8Scale(col("__v")).as("scale"),
        col("__v"))
      .select(col(idCol), col("scale"),
        transform(col("__v"), x => when(col("scale") === 0.0, lit(0L))
          .otherwise(floor(x / col("scale") + 0.5))).as("codes"))
}
