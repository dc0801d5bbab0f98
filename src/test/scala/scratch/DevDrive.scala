package scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val q = graft.GraphQueries.queries("graphx_pagerank")
    val out = q(spark, dir).where(!col("id").startsWith("customer") && !col("id").startsWith("supplier"))
      .orderBy("id").collect()
    out.foreach(r => println(s"MARKER ${r.getString(0)} ${r.getDouble(1)}"))
    spark.stop()
  }
}
