package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Clustering

class ClusteringSpec extends SparkSuite {
  import spark.implicits._

  // two tight blobs far apart; seeds 0 and 1 land one in each blob
  private def blobs = Seq(
    (0L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)), (4L, Array(0.05f, 0.05f)),
    (1L, Array(10.0f, 10.1f)), (3L, Array(10.1f, 10.0f)), (5L, Array(10.05f, 10.05f)))
    .toDF("vec_id", "embedding")

  test("silhouetteReport: hand-computed micro scores on a 1-d line, floor-division means") {
    // iters = 0 keeps the seeds (ids 1, 2) as centroids: c1 = 0, c2 = 10.
    //   v1 (0):  a = 0, b = 10 → s = 1.0        → 1000000
    //   v3 (1):  a = 1, b = 9  → s = 8/9        → 888889
    //   v4 (4):  a = 4, b = 6  → s = 1/3        → 333333
    //   v2 (10): a = 0, b = 10 → s = 1.0        → 1000000
    //   v5 (6):  a = 4, b = 6  → s = 1/3        → 333333
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(10.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f)), (4L, Array(4.0f, 0.0f)), (5L, Array(6.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.silhouetteReport(vecs, "vec_id", "embedding", k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // cluster 1 = {v1, v3, v4}: sum 2222222, mean floor(740740.67) = 740740
    // cluster 2 = {v2, v5}:     sum 1333333, mean floor(666666.5)  = 666666
    assert(out == Map(
      1L -> ((3L, 2222222L, 740740L)),
      2L -> ((2L, 1333333L, 666666L))), s"got $out")
    // degenerate: identical centroids and points → a = b = 0 scores 0
    val flat = Seq((1L, Array(5.0f)), (2L, Array(5.0f)), (3L, Array(5.0f)))
      .toDF("vec_id", "embedding")
    val z = Clustering.silhouetteReport(flat, "vec_id", "embedding", k = 2, iters = 0)
      .agg(sum("sum_sil_micro")).collect()(0).getLong(0)
    assert(z == 0L, s"got $z")
  }

  test("kmeans separates well-separated blobs and is deterministic") {
    val a = Clustering.kmeans(blobs, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a(0L) == 0L && a(2L) == 0L && a(4L) == 0L)
    assert(a(1L) == 1L && a(3L) == 1L && a(5L) == 1L)
    val b = Clustering.kmeans(blobs, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("centroids converge to the blob means") {
    val c = Clustering.kmeansCentroids(blobs, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(math.abs(c(0L)(0) - 0.05) < 1e-6 && math.abs(c(0L)(1) - 0.05) < 1e-6)
    assert(math.abs(c(1L)(0) - 10.05) < 1e-6 && math.abs(c(1L)(1) - 10.05) < 1e-6)
  }

  test("a cluster that captures no points keeps its previous centroid") {
    // seed 1 is a duplicate of seed 0's position, so every point prefers
    // cid 0 (distance tie -> smaller cid) and cluster 1 goes empty
    val degenerate = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val c = Clustering.kmeansCentroids(degenerate, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(c(1L) == Seq(0.0, 0.0)) // retained, not dropped or nulled
    assert(c.size == 2)
  }
}
