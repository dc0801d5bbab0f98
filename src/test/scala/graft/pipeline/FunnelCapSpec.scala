package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins the round-13 recall fix (ADVICE r12, medium): the fused funnel's
  * rare-shingle PROPOSAL must see the full distinct hash stream even for
  * documents whose shingle count exceeds the verify cap — the capped
  * bottom-8192 sketch is a verify-side memory guard, not a proposal
  * filter. In package graft.pipeline to reach the private[pipeline]
  * seams (perDocSigsAndSet, rareProposalHashes, rarePairsOnHashed). */
class FunnelCapSpec extends SparkSuite {
  import spark.implicits._

  test("rareProposalHashes: above-cap docs propose their FULL hash stream") {
    // B: 8200 distinct words → 8198 distinct 3-shingles, above the 8192 cap
    val bText = (1 to 8200).map(i => f"w$i%05d").mkString(" ")
    // A: the HIGHEST-hash shingle of B — by construction outside B's
    // bottom-8192 capped set; shared only by A and B, so its df is 2
    // (rare) and the engulfed pair (A, B) is proposable only through it
    val topShingle = TextAnalysis.shingleRowsDistinct(
        Seq((2L, bText)).toDF("doc_id", "text"), "doc_id", "text", 3)
      .select(col("shingle"), xxhash64(col("shingle")).as("h"))
      .orderBy(desc("h")).limit(1).collect()(0).getString(0)
    val corpus = Seq((1L, topShingle), (2L, bText),
      (3L, "an unrelated small third document sits right here"))
      .toDF("doc_id", "text")
    val perDoc = Dedup.perDocSigsAndSet(
      TextAnalysis.shingleRowsDistinct(corpus, "doc_id", "text", 3)
        .withColumnRenamed("doc_id", "doc"), 4)

    // only B is capped, and its __set really is truncated to the cap
    val flags = perDoc.select("doc", "__capped").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(1L -> false, 2L -> true, 3L -> false))
    val bSetSize = perDoc.where(col("doc") === 2L)
      .select(size(col("__set"))).collect()(0).getInt(0)
    assert(bSetSize == Dedup.MaxVerifyShinglesPerDoc)

    // the proposal stream equals the FULL distinct (doc, hash) stream
    val proposal = Curation.rareProposalHashes(perDoc, corpus, "doc_id", "text", 3)
    val full = TextAnalysis.shingleRowsDistinct(corpus, "doc_id", "text", 3)
      .select(col("doc_id").as("doc"), xxhash64(col("shingle")).as("__h"))
    assert(proposal.exceptAll(full).count() == 0)
    assert(full.exceptAll(proposal).count() == 0)

    // and the engulfed pair rides a rare shingle OUTSIDE B's cap:
    // proposed from the full stream, MISSED by the capped sketch alone
    val cand = Dedup.rarePairsOnHashed(proposal, maxDf = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)))
    val candCapped = Dedup.rarePairsOnHashed(
        perDoc.select(col("doc"), explode(col("__set")).as("__h")), maxDf = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!candCapped.contains((1L, 2L)),
      "sanity: the capped sketch must miss the above-cap pair, or this spec tests nothing")
  }
}
