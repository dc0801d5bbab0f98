package graft

import graft.model.PropValue
import graft.store.GraphBatch

/** Builds the reference's cocktail test graph (gravitydb-test-utils/src/
  * lib.rs:319-750) from the transcribed data table, with the same schema
  * semantics: every variant nests SchemaType("<Variant>") (lib.rs:768-782).
  */
object CocktailFixture {

  def prop(variant: String, payload: String): PropValue =
    if (variant == "Includes" || variant == "ServedIn") PropValue.typed(variant)
    else PropValue.typed(variant, Some(payload))

  /** Deterministic node ids derived from the fixture handle — the reference
    * uses fresh UUIDs; identity lives only in the id, so any unique id works. */
  def nodeId(handle: String): String = s"n-$handle"

  def build(): (GraphBatch, Map[String, String]) = {
    val b = new GraphBatch
    val ids = CocktailData.nodes.map { case (handle, kind, name) =>
      handle -> b.createNode(nodeId(handle), prop(kind, name))
    }.toMap
    CocktailData.edges.foreach { case (src, dst, label) =>
      b.createEdge(ids(src), ids(dst), prop(label, ""))
    }
    (b, ids)
  }
}
