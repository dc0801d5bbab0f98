package scratch
// depth sweep: is the n2v40 100x per-hop cost constant in depth? (deleted after)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object N2vSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val cp = graft.analytics.GraphAnalytics.coPurchasePairs(li, "o", "p", minShared = 2)
    val sym = cp.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(cp.select(col("b").as("src"), col("a").as("dst")))
    val e100 = (0 until 100).map(c =>
      sym.select((col("src") + lit(c.toLong * 10000000L)).as("src"),
        (col("dst") + lit(c.toLong * 10000000L)).as("dst")))
      .reduce(_ unionByName _).coalesce(64).persist()
    e100.count()
    graft.analytics.GraphAnalytics.node2vecWalks(e100, walkLen = 4,
      retMilli = 250, outMilli = 2000).count() // warm
    for (len <- Seq(10, 20, 40)) {
      val t0 = System.nanoTime()
      val n = graft.analytics.GraphAnalytics.node2vecWalks(e100, walkLen = len,
        retMilli = 250, outMilli = 2000).count()
      println(f"MARKER n2v_100x_len$len rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
