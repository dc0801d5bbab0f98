package scratch

import org.apache.spark.sql.SparkSession

/** Scratch perf probe for graph_pagerank_df (VERDICT r7 item #3). */
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
    val fn = graft.SparkEntry.queries("graph_pagerank_df")
    for (i <- 1 to 3) {
      val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      time(s"pagerank_df run$i") {
        fn(spark, dir).write.mode("overwrite").format("noop").save()
      }
      println(s"MEASURE jobs_run$i ${spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - jobs0}")
    }
    // comparison: lpa (same graph, 3 rounds) and graphx pagerank
    val lpa = graft.SparkEntry.queries("graph_lpa_df")
    time("lpa_df") { lpa(spark, dir).write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
