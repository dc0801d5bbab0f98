package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ql._

/** Wire-format compatibility with the reference's serde-JSON encoding
  * (to_query kv_graph_store.rs:867-873; CLI query-db cli_helpers.rs:271-277). */
class ZoeJsonSpec extends AnyFunSuite {

  private def roundtrip(q: BasicQuery): Unit =
    assert(ZoeJson.parse(ZoeJson.render(q)) == q)

  test("parses serde-shaped vertex query JSON") {
    val json = """{"V":{"Intersect":[{"Property":{"Specific":"ABC"}},"All"]}}"""
    assert(ZoeJson.parse(json) == BasicQuery.V(
      VertexQuery.Intersect(
        VertexQuery.Property(PropertyQuery.Specific("ABC")),
        VertexQuery.All)))
  }

  test("parses unit variants as bare strings") {
    assert(ZoeJson.parse("""{"E":"All"}""") == BasicQuery.E(EdgeQuery.All))
  }

  test("parses hop + tuple variants") {
    val json =
      """{"V":{"In":{"Intersect":[{"In":{"Property":{"Specific":"H1"}}},{"Property":{"Specific":"H2"}}]}}}"""
    val expected = BasicQuery.V(VertexQuery.In(
      EdgeQuery.Intersect(
        EdgeQuery.In(VertexQuery.Property(PropertyQuery.Specific("H1"))),
        EdgeQuery.Property(PropertyQuery.Specific("H2")))))
    assert(ZoeJson.parse(json) == expected)
    roundtrip(expected)
  }

  test("round-trips every operator") {
    val pq = PropertyQuery.FromTo("A", "B").referencingProperties.referencedProperties
    val v = VertexQuery.fromIds(Seq("a", "b"))
      .union(VertexQuery.all)
      .intersect(pq.referencingVertices)
      .substract(VertexQuery.Property(PropertyQuery.Specific("X")))
      .disjunctiveUnion(VertexQuery.all)
      .filter(ZFilter("sql", "schema_type = 'Cocktail'"))
      .store
    roundtrip(BasicQuery.V(v))
    val e = EdgeQuery.fromIds(Seq("e1"))
      .union(v.outgoing)
      .intersect(EdgeQuery.fromProperty(pq))
      .substract(EdgeQuery.all)
      .store
    roundtrip(BasicQuery.E(e))
    roundtrip(BasicQuery.P(pq))
    roundtrip(BasicQuery.E(v.ingoing))
    roundtrip(BasicQuery.V(e.ingoing.outgoing.ingoing))
  }
}
