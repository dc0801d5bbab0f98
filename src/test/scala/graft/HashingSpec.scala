package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Hashing, PropValue}
import graft.store.{GraphBatch, NodeExistsException}

/** Golden storage-identity tests pinned to the reference's constants
  * (gravitydb/tests/test_kv_store.rs:170-177 and FIXTURES.md §2): the
  * content-addressed keys must reproduce byte-for-byte. */
class HashingSpec extends AnyFunSuite {
  val node1 = "a1a2a3a4-b1b2-c1c2-d1d2-d3d4d5d6d7d8"
  val node2 = "e1e2e3e4-f1f2-a1a2-b1b2-b3b4b5b6b7b8"
  val emptyPropHash = "E3B0C44298FC1C149AFBF4C8996FB92427AE41E4649B934CA495991B7852B855"

  test("empty property hash (sha256 of zero bytes, uppercase hex)") {
    assert(Hashing.sha256HexUpper("") == emptyPropHash)
  }

  test("simple text property hash") {
    assert(Hashing.sha256HexUpper("simple text property") ==
      "4637D294486C315FC8D6C2F11742CBA4958CCB3F083656808C2B257D954DE631")
  }

  test("edge id = content hash of canonical edge JSON") {
    assert(Hashing.edgeId(emptyPropHash, node1, node2) ==
      "0B49457674D1B570400E6EC9E4B78F9C2C9B0721BA7C315BD0811E3059C3BBBA")
  }

  test("self-loop edge id (nodes_can_be_connected_with_themselfes)") {
    assert(Hashing.edgeId(emptyPropHash, node1, node1) ==
      "7622305FED0A357AF8AAE5ACC4110B8CAD7BDF2D67CAEA195BCDA0889A20FB8A")
  }

  test("node record JSON shape (kv_graph_store.rs:791-820 field order)") {
    val b = new GraphBatch
    b.createNode(node1, PropValue("Raw", None, Nil, Some(emptyPropHash)))
    b.createNode(node2, PropValue("Raw", None, Nil, Some(emptyPropHash)))
    val eid = b.createEdge(node1, node2, PropValue("Raw", None, Nil, Some(emptyPropHash)))
    assert(b.nodeRecordJson(node1) ==
      s"""{"id":"$node1","properties":"$emptyPropHash","incoming":[],"outgoing":["$eid"]}""")
    assert(b.nodeRecordJson(node2) ==
      s"""{"id":"$node2","properties":"$emptyPropHash","incoming":["$eid"],"outgoing":[]}""")
  }

  test("duplicate node create fails with NodeExists (same and different content)") {
    val b = new GraphBatch
    b.createNode(node1, PropValue("Ingredient", Some("gin")))
    intercept[NodeExistsException] { b.createNode(node1, PropValue("Ingredient", Some("gin"))) }
    intercept[NodeExistsException] { b.createNode(node1, PropValue("Ingredient", Some("rum"))) }
  }

  test("edge identity dedups equal (prop, src, dst) triples") {
    val b = new GraphBatch
    b.createNode("a", PropValue("X", Some("1")))
    b.createNode("b", PropValue("X", Some("2")))
    val e1 = b.createEdge("a", "b", PropValue.typed("Includes"))
    val e2 = b.createEdge("a", "b", PropValue.typed("Includes"))
    assert(e1 == e2)
    assert(b.edgeIds.size == 1)
  }

  test("externally-tagged variant JSON matches serde encoding") {
    assert(PropValue("Cocktail", Some("Negroni")).json == """{"Cocktail":"Negroni"}""")
    assert(PropValue("Includes").json == "\"Includes\"")
    assert(PropValue("Name", Some("a\"b\\c")).json == """{"Name":"a\"b\\c"}""")
  }

  test("property refcount GC: deleting the last referrer deletes the property tree") {
    val b = new GraphBatch
    val p = PropValue.typed("Glass", Some("teacup")) // nests SchemaType("Glass")
    b.createNode("g1", p)
    assert(b.propKeys.toSet ==
      Set(p.hash, PropValue.schemaType("Glass").hash))
    b.deleteNode("g1")
    assert(b.propKeys.isEmpty)
  }

  test("shared property survives while another referrer exists") {
    val b = new GraphBatch
    val p = PropValue.typed("Glass", Some("teacup"))
    b.createNode("g1", p)
    b.createNode("g2", p)
    b.deleteNode("g1")
    assert(b.propKeys.toSet == Set(p.hash, PropValue.schemaType("Glass").hash))
    b.deleteNode("g2")
    assert(b.propKeys.isEmpty)
  }

  test("delete_node leaves incident edges dangling (reference parity)") {
    val b = new GraphBatch
    b.createNode("a", PropValue("X", Some("1")))
    b.createNode("b", PropValue("X", Some("2")))
    val e = b.createEdge("a", "b", PropValue.typed("Link"))
    b.deleteNode("b")
    assert(b.edgeIds == Seq(e))
  }
}
