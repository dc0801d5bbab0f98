package graft.ql

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** JSON codec for the Zoe AST, wire-compatible with the reference's serde
  * externally-tagged enum encoding (to_query, kv_graph_store.rs:867-873;
  * CLI query-db reads the same shape, cli_helpers.rs:271-277):
  *
  *  - unit variant        -> `"All"`
  *  - newtype variant     -> `{"Specific":[...]}` / `{"Out":{...}}`
  *  - tuple variant       -> `{"Union":[a, b]}`
  */
object ZoeJson {
  private val mapper = new ObjectMapper()

  def parse(json: String): BasicQuery = decodeBasic(mapper.readTree(json))
  def render(q: BasicQuery): String = mapper.writeValueAsString(encodeBasic(q))

  // ---- decode ----

  def decodeBasic(n: JsonNode): BasicQuery = {
    val (tag, body) = taggedOf(n)
    tag match {
      case "V" => BasicQuery.V(decodeV(body))
      case "E" => BasicQuery.E(decodeE(body))
      case "P" => BasicQuery.P(decodeP(body))
      case t   => fail(s"unknown BasicQuery tag $t")
    }
  }

  def decodeV(n: JsonNode): VertexQuery = {
    import VertexQuery._
    val (tag, b) = taggedOf(n)
    tag match {
      case "All"              => All
      case "Specific"         => Specific(b.elements().asScala.map(_.asText()).toSeq)
      case "Property"         => Property(decodeP(b))
      case "Out"              => Out(decodeE(b))
      case "In"               => In(decodeE(b))
      case "Union"            => Union(decodeV(b.get(0)), decodeV(b.get(1)))
      case "Intersect"        => Intersect(decodeV(b.get(0)), decodeV(b.get(1)))
      case "Substract"        => Substract(decodeV(b.get(0)), decodeV(b.get(1)))
      case "DisjunctiveUnion" => DisjunctiveUnion(decodeV(b.get(0)), decodeV(b.get(1)))
      case "Filter"           => Filter(decodeV(b.get(0)), decodeFilter(b.get(1)))
      case "Store"            => Store(decodeV(b))
      case t                  => fail(s"unknown VertexQuery tag $t")
    }
  }

  def decodeE(n: JsonNode): EdgeQuery = {
    import EdgeQuery._
    val (tag, b) = taggedOf(n)
    tag match {
      case "All"              => All
      case "Specific"         => Specific(b.elements().asScala.map(_.asText()).toSeq)
      case "Property"         => Property(decodeP(b))
      case "Out"              => Out(decodeV(b))
      case "In"               => In(decodeV(b))
      case "Union"            => Union(decodeE(b.get(0)), decodeE(b.get(1)))
      case "Intersect"        => Intersect(decodeE(b.get(0)), decodeE(b.get(1)))
      case "Substract"        => Substract(decodeE(b.get(0)), decodeE(b.get(1)))
      case "DisjunctiveUnion" => DisjunctiveUnion(decodeE(b.get(0)), decodeE(b.get(1)))
      case "Filter"           => Filter(decodeE(b.get(0)), decodeFilter(b.get(1)))
      case "Store"            => Store(decodeE(b))
      case t                  => fail(s"unknown EdgeQuery tag $t")
    }
  }

  def decodeP(n: JsonNode): PropertyQuery = {
    import PropertyQuery._
    val (tag, b) = taggedOf(n)
    tag match {
      case "Specific"              => Specific(b.asText())
      case "FromTo"                => FromTo(b.get(0).asText(), b.get(1).asText())
      case "ReferencingProperties" => ReferencingProperties(decodeP(b))
      case "ReferencedProperties"  => ReferencedProperties(decodeP(b))
      case t                       => fail(s"unknown PropertyQuery tag $t")
    }
  }

  private def decodeFilter(n: JsonNode): ZFilter =
    ZFilter(n.get("interpreter").asText(), n.get("script").asText())

  private def taggedOf(n: JsonNode): (String, JsonNode) =
    if (n.isTextual) (n.asText(), mapper.nullNode())
    else {
      val fields = n.properties().asScala
      require(fields.size == 1, s"expected externally-tagged enum, got $n")
      val e = fields.head
      (e.getKey, e.getValue)
    }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // ---- encode ----

  private def tagged(tag: String, body: JsonNode): ObjectNode = {
    val o = mapper.createObjectNode()
    o.set[ObjectNode](tag, body)
    o
  }
  private def pair(a: JsonNode, b: JsonNode): ArrayNode = {
    val arr = mapper.createArrayNode(); arr.add(a); arr.add(b); arr
  }
  private def strings(xs: Seq[String]): ArrayNode = {
    val arr = mapper.createArrayNode(); xs.foreach(arr.add); arr
  }

  def encodeBasic(q: BasicQuery): JsonNode = q match {
    case BasicQuery.V(v) => tagged("V", encodeV(v))
    case BasicQuery.E(e) => tagged("E", encodeE(e))
    case BasicQuery.P(p) => tagged("P", encodeP(p))
  }

  def encodeV(q: VertexQuery): JsonNode = {
    import VertexQuery._
    q match {
      case All                   => mapper.getNodeFactory.textNode("All")
      case Specific(ids)         => tagged("Specific", strings(ids))
      case Property(pq)          => tagged("Property", encodeP(pq))
      case Out(eq)               => tagged("Out", encodeE(eq))
      case In(eq)                => tagged("In", encodeE(eq))
      case Union(a, b)           => tagged("Union", pair(encodeV(a), encodeV(b)))
      case Intersect(a, b)       => tagged("Intersect", pair(encodeV(a), encodeV(b)))
      case Substract(a, b)       => tagged("Substract", pair(encodeV(a), encodeV(b)))
      case DisjunctiveUnion(a, b) => tagged("DisjunctiveUnion", pair(encodeV(a), encodeV(b)))
      case Filter(s, f)          => tagged("Filter", pair(encodeV(s), encodeFilter(f)))
      case Store(s)              => tagged("Store", encodeV(s))
    }
  }

  def encodeE(q: EdgeQuery): JsonNode = {
    import EdgeQuery._
    q match {
      case All                   => mapper.getNodeFactory.textNode("All")
      case Specific(ids)         => tagged("Specific", strings(ids))
      case Property(pq)          => tagged("Property", encodeP(pq))
      case Out(vq)               => tagged("Out", encodeV(vq))
      case In(vq)                => tagged("In", encodeV(vq))
      case Union(a, b)           => tagged("Union", pair(encodeE(a), encodeE(b)))
      case Intersect(a, b)       => tagged("Intersect", pair(encodeE(a), encodeE(b)))
      case Substract(a, b)       => tagged("Substract", pair(encodeE(a), encodeE(b)))
      case DisjunctiveUnion(a, b) => tagged("DisjunctiveUnion", pair(encodeE(a), encodeE(b)))
      case Filter(s, f)          => tagged("Filter", pair(encodeE(s), encodeFilter(f)))
      case Store(s)              => tagged("Store", encodeE(s))
    }
  }

  def encodeP(q: PropertyQuery): JsonNode = {
    import PropertyQuery._
    q match {
      case Specific(id)               => tagged("Specific", mapper.getNodeFactory.textNode(id))
      case FromTo(a, b)               => tagged("FromTo", pair(
        mapper.getNodeFactory.textNode(a), mapper.getNodeFactory.textNode(b)))
      case ReferencingProperties(pq)  => tagged("ReferencingProperties", encodeP(pq))
      case ReferencedProperties(pq)   => tagged("ReferencedProperties", encodeP(pq))
    }
  }

  private def encodeFilter(f: ZFilter): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("interpreter", f.interpreter)
    o.put("script", f.script)
    o
  }
}
