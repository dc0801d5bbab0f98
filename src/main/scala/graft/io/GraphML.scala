package graft.io

import scala.collection.mutable
import graft.model.PropValue
import graft.store.GraphBatch

/** GraphML import, mirroring the reference importer's shape
  * (import/graphml.rs:7-165): streaming parse of
  * `<graph><node id="..">prop</node><edge source=".." target="..">prop</edge>`,
  * a pluggable property mapper from the element's inner XML/text to a
  * property value, a pluggable node-key mapper (default: memoized fresh
  * UUIDs, graphml.rs uuid_mapper), and the id->key mapping returned.
  *
  * The importer builds a [[GraphBatch]] (exact mutation semantics); bulk
  * distributed ingest of huge GraphML is out of scope — GraphML is a small
  * interchange format, the scale path is parquet.
  */
object GraphML {

  type NodeKeyMapper = (String, mutable.Map[String, String]) => String
  type PropMapper = String => PropValue

  /** Default node-key mapper: a fresh UUID per distinct GraphML id, memoized
    * (graphml.rs uuid_mapper). */
  val uuidMapper: NodeKeyMapper = (id, seen) =>
    seen.getOrElseUpdate(id, java.util.UUID.randomUUID().toString)

  /** Default property mapper: the reference's serde-XML default maps
    * `<Label>text</Label>` to variant Label("text"); plain text maps to a
    * raw string property. Text arrives already entity-decoded by the StAX
    * parser — decoding again here would corrupt payloads that contain
    * literal entity text (e.g. the 4-char string "&lt;"). */
  val xmlPropMapper: PropMapper = { input =>
    val trimmed = input.trim
    val m = "(?s)^<(\\w+)>(.*)</\\w+>$".r
    trimmed match {
      case m(variant, payload) => PropValue.typed(variant, Some(payload))
      case "" => PropValue("Raw", None, Nil, Some(graft.model.Hashing.sha256HexUpper("")))
      case other => PropValue("Raw", Some(other))
    }
  }

  final case class Result(batch: GraphBatch, idMapping: Map[String, String])

  /** Parse GraphML text into a GraphBatch. Returns the batch plus the
    * GraphML-id -> node-key mapping (the reference returns the same map). */
  def importString(
      xml: String,
      nodeKeyMapper: NodeKeyMapper = uuidMapper,
      propMapper: PropMapper = xmlPropMapper): Result = {
    val batch = new GraphBatch
    val seen = mutable.LinkedHashMap[String, String]()

    val factory = javax.xml.stream.XMLInputFactory.newInstance()
    factory.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    val reader = factory.createXMLEventReader(new java.io.StringReader(xml))

    var current: Option[(String, Map[String, String])] = None // (element, attrs)
    val content = new StringBuilder
    var depth = 0

    def attrsOf(e: javax.xml.stream.events.StartElement): Map[String, String] = {
      val it = e.getAttributes
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val a = it.next(); b += (a.getName.getLocalPart -> a.getValue) }
      b.result()
    }

    while (reader.hasNext) {
      val ev = reader.nextEvent()
      if (ev.isStartElement) {
        val se = ev.asStartElement()
        val name = se.getName.getLocalPart
        if (current.isEmpty && (name == "node" || name == "edge")) {
          current = Some((name, attrsOf(se)))
          content.clear(); depth = 0
        } else if (current.isDefined) {
          // nested markup is part of the property payload
          depth += 1
          content.append(s"<$name>")
        }
      } else if (ev.isCharacters && current.isDefined) {
        content.append(ev.asCharacters().getData)
      } else if (ev.isEndElement) {
        val name = ev.asEndElement().getName.getLocalPart
        if (current.isDefined && (name == "node" || name == "edge") && depth == 0) {
          val (kind, attrs) = current.get
          val prop = propMapper(content.toString)
          if (kind == "node") {
            val key = nodeKeyMapper(attrs("id"), seen)
            batch.createNode(key, prop)
          } else {
            val src = nodeKeyMapper(attrs("source"), seen)
            val dst = nodeKeyMapper(attrs("target"), seen)
            batch.createEdge(src, dst, prop)
          }
          current = None
        } else if (current.isDefined) {
          depth -= 1
          content.append(s"</$name>")
        }
      }
    }
    Result(batch, seen.toMap)
  }
}
