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
  *   graft.io.ZoeCli script <dbPath> <sql>  run a ;-separated SQL script over
  *                                          the graph views (the reference's
  *                                          lua `script` verb, with Spark SQL
  *                                          as the embedded language)
  *   graft.io.ZoeCli repl <dbPath>          interactive/piped SQL statements
  *                                          on stdin (reference `repl` verb)
  *   graft.io.ZoeCli explain <dbPath>       Zoe JSON on stdin -> formatted
  *                                          optimized Catalyst plan
  *   graft.io.ZoeCli export <dbPath> <fmt>  dot | graphml to stdout
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // graft_dot / graft_cosine available in the script/repl SQL verbs
    graft.functions.GraftExtensions.register(spark)
    try run(spark, args.toList)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "init" :: path :: Nil =>
      GraphStore.empty(spark).save(path)
      println(s"initialized empty graph store at $path")
    case "query" :: path :: Nil =>
      val g = GraphStore.load(spark, path)
      val json = readStdin()
      val q = ZoeJson.parse(json)
      println(renderResult(new ZoeCompiler(g).run(q)))
    // explain: the optimized Catalyst plan a Zoe query compiles to — the
    // debuggability surface a declarative engine owes its users (the
    // reference interprets eagerly and has no plan to show)
    case "explain" :: path :: Nil =>
      val g = GraphStore.load(spark, path)
      val q = ZoeJson.parse(readStdin())
      val r = new ZoeCompiler(g).run(q)
      val df = q match {
        case graft.ql.BasicQuery.P(_) => r.properties
        case graft.ql.BasicQuery.E(_) => r.edges
        case _                        => r.vertices
      }
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    // script/repl (cli_helpers.rs:225-234): the reference embeds Lua; here
    // the embedded query language is Spark SQL over the graft_* graph views
    // (TypedViews.registerViews) — same role, declarative + distributed.
    case "script" :: path :: file :: Nil =>
      val g = GraphStore.load(spark, path)
      graft.model.TypedViews.registerViews(g)
      CliLimits.splitSql(scala.io.Source.fromFile(file).mkString)
        .foreach(stmt => runSql(spark, stmt))
    // Lua-compat migration path: the reference's documented Lua builder
    // subset runs unmodified (translator, not interpreter — LuaCompat)
    case "script" :: path :: "--lua" :: file :: Nil =>
      LuaCompat.run(spark, path, scala.io.Source.fromFile(file).mkString)
    // Lua-compat repl (reference lua_repl parity): line-based, one
    // persistent session, per-line errors don't kill the loop
    case "repl" :: path :: "--lua" :: Nil =>
      LuaCompat.repl(spark, path,
        Iterator.continually(Console.in.readLine()).takeWhile(_ != null))
    case "repl" :: path :: Nil =>
      val g = GraphStore.load(spark, path)
      graft.model.TypedViews.registerViews(g)
      // statements are quote-aware-split on ';' and each evaluated in its
      // own try so one bad statement never kills the session
      CliLimits.splitSql(readStdin()).foreach { stmt =>
        try runSql(spark, stmt)
        catch { case e: Exception => System.err.println(s"error: ${e.getMessage}") }
      }
    // export to interchange formats (reference design intent,
    // docs/gravity.adoc:102-238 — TODO stubs there, implemented here)
    case "export" :: path :: fmt :: Nil =>
      val g = GraphStore.load(spark, path)
      fmt match {
        case "dot"     => println(GraphExport.toDot(g))
        case "graphml" => println(GraphExport.toGraphML(g))
        case other     => sys.error(s"unknown export format: $other (dot|graphml)")
      }
    case "import" :: path :: file :: Nil =>
      val xml = scala.io.Source.fromFile(file).mkString
      val res = GraphML.importString(xml)
      res.batch.toStore(spark).save(path)
      println(res.idMapping.map { case (k, v) => s"$k -> $v" }.mkString("\n"))
    // property-id: content hash of the property bytes on stdin
    // (cli_helpers.rs property-id verb)
    case "property-id" :: Nil =>
      println(graft.model.Hashing.sha256HexUpper(readStdin()))
    // property-blob: canonical serialized bytes (identity for raw input)
    case "property-blob" :: Nil =>
      print(readStdin())
    // create-node [--id <id> | --update <id> | --get-or-create] with the raw
    // property from stdin; prints the node id (cli_helpers.rs create-node
    // flag set: --id/--create-id/--update/--get-or-create)
    case "create-node" :: path :: rest =>
      val value = readStdin()
      val p = rawProp(value)
      val g = GraphStore.load(spark, path)
      val spark2 = spark
      import spark2.implicits._
      def withProp(st: GraphStore) = graft.store.BulkMutations.createProperties(st,
        Seq((p.hash, value, p.variant)).toDF("hash", "value", "schema_type"))
      rest match {
        case "--get-or-create" :: Nil =>
          // reuse the node if exactly one already holds this property
          // (cli_helpers.rs:118-174)
          val (g2, id) = graft.store.BulkMutations.getOrCreateNode(g, p)
          g2.save(path)
          println(id)
        case "--update" :: id :: Nil =>
          // repoint an existing node to the new property + GC the old one
          require(!g.vertices.where(org.apache.spark.sql.functions.col("id") === id).isEmpty,
            s"node $id does not exist")
          val repointed = withProp(g).copy(vertices =
            g.vertices.withColumn("prop_hash",
              org.apache.spark.sql.functions.when(
                org.apache.spark.sql.functions.col("id") === id,
                p.hash).otherwise(org.apache.spark.sql.functions.col("prop_hash"))))
          graft.store.BulkMutations.gcOrphanProps(repointed).save(path)
          println(id)
        case flags =>
          val id = flags match {
            case "--id" :: v :: Nil => v
            case Nil                => java.util.UUID.randomUUID().toString
            case other => sys.error(s"unknown create-node args: $other")
          }
          graft.store.BulkMutations
            .createNodes(withProp(g), Seq((id, p.hash)).toDF("id", "prop_hash"))
            .save(path)
          println(id)
      }
    case "delete-node" :: path :: "--id" :: id :: Nil =>
      val g = GraphStore.load(spark, path)
      val spark2 = spark
      import spark2.implicits._
      graft.store.BulkMutations.gcOrphanProps(
        graft.store.BulkMutations.deleteNodes(g, Seq(id).toDF("id"))).save(path)
      println(s"deleted $id")
    // create-edge --out <srcId> --in <dstId>, property from stdin; prints
    // the edge hash
    case "create-edge" :: path :: "--out" :: src :: "--in" :: dst :: Nil =>
      val value = readStdin()
      val p = rawProp(value)
      val g = GraphStore.load(spark, path)
      val spark2 = spark
      import spark2.implicits._
      val withProps = graft.store.BulkMutations.createProperties(g,
        Seq((p.hash, value, p.variant)).toDF("hash", "value", "schema_type"))
      graft.store.BulkMutations.createEdges(withProps,
        Seq((src, dst, p.hash)).toDF("src", "dst", "prop_hash")).save(path)
      println(graft.model.Hashing.edgeId(p.hash, src, dst))
    case other =>
      System.err.println(
        s"""unknown arguments: ${other.mkString(" ")}
           |usage:
           |  init <dbPath>
           |  query <dbPath>                      (stdin: Zoe JSON)
           |  import <dbPath> <graphml>
           |  export <dbPath> dot|graphml
           |  script <dbPath> <sqlFile>           (;-separated SQL over graft_* views)
           |  script <dbPath> --lua <luaFile>     (reference Lua builder subset)
           |  repl <dbPath> --lua                 (stdin: line-based Lua-compat repl)
           |  repl <dbPath>                       (stdin: ;-separated SQL)
           |  property-id                         (stdin: property bytes)
           |  property-blob                       (stdin: property bytes)
           |  create-node <dbPath> [--id <id>]    (stdin: property bytes)
           |  delete-node <dbPath> --id <id>
           |  create-edge <dbPath> --out <src> --in <dst>  (stdin: property bytes)""".stripMargin)
      sys.exit(2)
  }

  /** Evaluate one SQL statement and print the result as JSON lines (guarded
    * by the same driver-side row limit as renderResult). */
  private def runSql(spark: SparkSession, stmt: String): Unit = {
    val df = spark.sql(stmt)
    val max = CliLimits.maxResultRows
    val rows = df.toJSON.limit(max + 1).collect()
    require(rows.length <= max,
      s"result exceeds $max rows; add a LIMIT or raise GRAFT_MAX_RESULT_ROWS")
    rows.foreach(println)
  }

  /** Read all of stdin via Console.in (redirectable in tests via
    * Console.withIn, defaults to System.in). */
  private def readStdin(): String =
    Iterator.continually(Console.in.read()).takeWhile(_ != -1).map(_.toChar).mkString

  /** Raw-bytes property (reference GenericProperty, schema.rs:88-115): the
    * key is the content hash of the bytes as-is. */
  private def rawProp(value: String): graft.model.PropValue =
    graft.model.PropValue("Raw", Some(value), Nil,
      Some(graft.model.Hashing.sha256HexUpper(value)))

  /** Reference QueryResult JSON: vertices/edges as [id, propId] pairs (propId
    * always null, ql.rs:407), paths as [start, [[v,e]...], end]. Collects to
    * the driver (wire-format parity with the reference CLI) behind the
    * GRAFT_MAX_RESULT_ROWS guard. */
  def renderResult(r: ZoeResult): String = {
    def s(x: String) = graft.model.PropValue.jsonString(x)
    def optS(x: String) = if (x == null) "null" else s(x)
    val max = CliLimits.maxResultRows
    def guarded(df: org.apache.spark.sql.DataFrame, what: String) = {
      val rows = df.limit(max + 1).collect()
      require(rows.length <= max,
        s"$what result exceeds $max rows; raise GRAFT_MAX_RESULT_ROWS or narrow the query")
      rows
    }
    val vs = guarded(r.vertices, "vertices").map(row => s"[${s(row.getString(0))},null]").sorted
    val es = guarded(r.edges, "edges").map(row => s"[${s(row.getString(0))},null]").sorted
    val ps = guarded(r.paths, "paths").map { row =>
      val start = optS(if (row.isNullAt(0)) null else row.getString(0))
      val hops = row.getSeq[org.apache.spark.sql.Row](1)
        .map(h => s"[${s(h.getString(0))},${s(h.getString(1))}]").mkString("[", ",", "]")
      val end = optS(if (row.isNullAt(2)) null else row.getString(2))
      s"[$start,$hops,$end]"
    }.sorted
    val vars = r.variables.collect()
      .map(row => s"${s(row.getString(0))}:${s(row.getString(1))}").sorted
    s"""{"vertices":[${vs.mkString(",")}],"edges":[${es.mkString(",")}],"paths":[${ps.mkString(",")}],"variables":{${vars.mkString(",")}}}"""
  }
}
