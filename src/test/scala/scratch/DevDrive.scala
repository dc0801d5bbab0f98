package scratch

import org.apache.spark.sql.SparkSession

/** Scratch perf probe: funnel with shared neardupLabels memo (cold/warm). */
object DevDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"MEASURE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("graph_build") { graft.TpchGraph.build(spark, dir) }
    def run(name: String, label: String): Unit = time(label) {
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    graft.PipelineQueries.clearMemos(spark, dir)
    run("curate_funnel", "funnel_cold")          // pays the LSH+cc pass
    run("curate_funnel", "funnel_warm_memo")     // memo hit
    graft.PipelineQueries.clearMemos(spark, dir)
    run("curate_dup_clusters_df", "dup_clusters_cold")
    run("curate_funnel", "funnel_after_clusters") // shared memo: no LSH+cc
    run("curate_funnel_rare", "funnel_rare_cold") // own corpus, full pipeline + arm
    spark.stop()
  }
}
