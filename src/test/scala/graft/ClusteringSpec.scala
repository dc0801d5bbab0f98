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
