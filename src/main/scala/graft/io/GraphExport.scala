package graft.io

import org.apache.spark.sql.functions._
import graft.model.GraphStore

/** Graph export to interchange formats, realizing the reference's declared
  * io intent (docs/gravity.adoc:102-238 — dot / graphml are TODO stubs
  * there). Export collects to the driver (these are small interchange
  * formats, not the 100 TB path — that's parquet/`GraphStore.save`) behind
  * the same row guard as the CLI.
  *
  * GraphML output uses exactly the element shape [[GraphML.importString]]
  * parses (`<node id=..><Variant>payload</Variant></node>`), so
  * export → import round-trips TYPED property values bit-for-bit. Unit and
  * raw variants have no GraphML element syntax in the importer's dialect —
  * they export as bare text and re-import as Raw text properties (values
  * preserved, variant tag and hence hashes not); likewise a Raw text value
  * that itself LOOKS like an element (e.g. the literal string
  * "&lt;b&gt;x&lt;/b&gt;") re-imports as the typed variant b("x"), because
  * the importer's default mapper recognizes markup shape, not provenance.
  * Graphs that must round-trip identity use typed properties or the
  * parquet store format.
  */
object GraphExport {

  /** Rows of every vertex/edge joined with its property value; canonical
    * values are `{"Variant":"payload"}` or `"Variant"`. */
  private def labeled(g: GraphStore, base: org.apache.spark.sql.DataFrame) = {
    val p = g.props
    val rows = base
      .join(p.select(p("hash").as("__h"), p("value")), col("prop_hash") === col("__h"), "left")
      .drop("__h", "prop_hash")
    val max = CliLimits.maxResultRows
    val out = rows.limit(max + 1).collect()
    require(out.length <= max,
      s"export exceeds $max elements; raise GRAFT_MAX_RESULT_ROWS or export parquet instead")
    out
  }

  private val typedRe = """^\{"([^"]+)":"(.*)"\}$""".r
  private val unitRe = """^"(.*)"$""".r

  /** Inverse of [[graft.model.PropValue.jsonString]] for extracted payloads
    * (the canonical value stores the payload JSON-escaped). */
  private def jsonUnescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'u' if i + 6 <= s.length &&
              s.substring(i + 2, i + 6).forall(d => Character.digit(d, 16) >= 0) =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case o    => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def xmlEscape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;").replace("'", "&apos;")

  /** Property value JSON -> inner XML for the GraphML element (inverse of
    * [[GraphML.xmlPropMapper]]). */
  private def valueXml(value: String): String = value match {
    case null                 => ""
    case typedRe(variant, payload) => s"<$variant>${xmlEscape(jsonUnescape(payload))}</$variant>"
    case unitRe(payload)      => xmlEscape(jsonUnescape(payload))
    case other                => xmlEscape(other)
  }

  /** Graphviz dot rendering: one node per vertex (label = property value),
    * one directed edge per edge row. */
  def toDot(g: GraphStore, graphName: String = "graft"): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val nodes = labeled(g, g.vertices).map { r =>
      val label = Option(r.getAs[String]("value")).getOrElse(r.getAs[String]("id"))
      s"  ${q(r.getAs[String]("id"))} [label=${q(label)}];"
    }.sorted
    val edges = labeled(g, g.edges).map { r =>
      val label = Option(r.getAs[String]("value")).getOrElse("")
      s"  ${q(r.getAs[String]("src"))} -> ${q(r.getAs[String]("dst"))} [label=${q(label)}];"
    }.sorted
    (s"digraph ${graphName} {" +: (nodes ++ edges) :+ "}").mkString("\n")
  }

  /** GraphML rendering in the importer's dialect; node ids become the
    * GraphML ids (pass an id-preserving nodeKeyMapper on re-import to
    * round-trip identity too). */
  def toGraphML(g: GraphStore): String = {
    val nodes = labeled(g, g.vertices).map { r =>
      s"""  <node id="${xmlEscape(r.getAs[String]("id"))}">${valueXml(r.getAs[String]("value"))}</node>"""
    }.sorted
    val edges = labeled(g, g.edges).map { r =>
      s"""  <edge source="${xmlEscape(r.getAs[String]("src"))}" target="${xmlEscape(r.getAs[String]("dst"))}">${valueXml(r.getAs[String]("value"))}</edge>"""
    }.sorted
    ("<graph>" +: (nodes ++ edges) :+ "</graph>").mkString("\n")
  }
}
