package graft.io

import org.apache.spark.sql.SparkSession
import graft.exec.{ZoeCompiler, ZoeResult}
import graft.model.GraphStore
import graft.ql.ZoeJson

/** CLI parity with the reference's `gravitydb` binary (cli_helpers.rs:39-251):
  *
  *   graft.io.ZoeCli init <dbPath>          create an empty store layout
  *   graft.io.ZoeCli query <dbPath>         Zoe JSON on stdin -> JSON result
  *   graft.io.ZoeCli import <dbPath> <file> GraphML import
  *
  * Result JSON shape follows the reference's QueryResult serialization:
  * {"vertices":[[id,null],...],"edges":[...],"paths":[[start,[[v,e]..],end],...]}.
  */
object ZoeCli {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toList)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "init" :: path :: Nil =>
      GraphStore.empty(spark).save(path)
      println(s"initialized empty graph store at $path")
    case "query" :: path :: Nil =>
      val g = GraphStore.load(spark, path)
      val json = scala.io.Source.stdin.mkString
      val q = ZoeJson.parse(json)
      println(renderResult(new ZoeCompiler(g).run(q)))
    case "import" :: path :: file :: Nil =>
      val xml = scala.io.Source.fromFile(file).mkString
      val res = GraphML.importString(xml)
      res.batch.toStore(spark).save(path)
      println(res.idMapping.map { case (k, v) => s"$k -> $v" }.mkString("\n"))
    case other =>
      System.err.println(
        s"""unknown arguments: ${other.mkString(" ")}
           |usage: init <dbPath> | query <dbPath> (stdin: Zoe JSON) | import <dbPath> <graphml>""".stripMargin)
      sys.exit(2)
  }

  /** Reference QueryResult JSON: vertices/edges as [id, propId] pairs (propId
    * always null, ql.rs:407), paths as [start, [[v,e]...], end]. */
  def renderResult(r: ZoeResult): String = {
    def s(x: String) = graft.model.PropValue.jsonString(x)
    def optS(x: String) = if (x == null) "null" else s(x)
    val vs = r.vertices.collect().map(row => s"[${s(row.getString(0))},null]").sorted
    val es = r.edges.collect().map(row => s"[${s(row.getString(0))},null]").sorted
    val ps = r.paths.collect().map { row =>
      val start = optS(if (row.isNullAt(0)) null else row.getString(0))
      val hops = row.getSeq[org.apache.spark.sql.Row](1)
        .map(h => s"[${s(h.getString(0))},${s(h.getString(1))}]").mkString("[", ",", "]")
      val end = optS(if (row.isNullAt(2)) null else row.getString(2))
      s"[$start,$hops,$end]"
    }.sorted
    s"""{"vertices":[${vs.mkString(",")}],"edges":[${es.mkString(",")}],"paths":[${ps.mkString(",")}],"variables":{}}"""
  }
}
