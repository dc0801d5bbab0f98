package graft.ql

import graft.model.PropValue

/** The Zoe query language: a Gremlin-inspired, serialization-first traversal
  * AST, re-expressed as Scala ADTs. Shape and variant names match the
  * reference's three mutually recursive enums (ql.rs:10-225) so that the
  * serde-JSON wire format round-trips (see [[ZoeJson]]).
  *
  * Queries are pure values; execution is in graft.exec.ZoeCompiler which
  * compiles a query to ONE lazy Catalyst plan (joins/semi-joins/anti-joins)
  * instead of the reference's per-element KV interpretation
  * (kv_graph_store.rs:139-305).
  */
sealed trait VertexQuery {
  def union(q: VertexQuery): VertexQuery = VertexQuery.Union(this, q)
  def intersect(q: VertexQuery): VertexQuery = VertexQuery.Intersect(this, q)
  def substract(q: VertexQuery): VertexQuery = VertexQuery.Substract(this, q)
  def disjunctiveUnion(q: VertexQuery): VertexQuery = VertexQuery.DisjunctiveUnion(this, q)
  def store: VertexQuery = VertexQuery.Store(this)
  def filter(f: ZFilter): VertexQuery = VertexQuery.Filter(this, f)
  /** Edges leaving these vertices (ql.rs:80-82). */
  def outgoing: EdgeQuery = EdgeQuery.Out(this)
  /** Edges arriving at these vertices (ql.rs:84-86). */
  def ingoing: EdgeQuery = EdgeQuery.In(this)

  // `outgoing(filter)` / `ingoing(filter)` sugar from the reference's Lua
  // embedding (lua.rs:130-178): the filter auto-intersects the hop result.
  /** Outgoing edges restricted to those carrying a property from `filter`. */
  def outgoing(filter: PropertyQuery): EdgeQuery =
    outgoing.intersect(filter.referencingEdges)
  /** Outgoing edges intersected with an edge sub-query. */
  def outgoing(filter: EdgeQuery): EdgeQuery = outgoing.intersect(filter)
  /** Hop through outgoing edges to target vertices restricted by `filter`. */
  def outgoing(filter: VertexQuery): VertexQuery =
    outgoing.outgoing.intersect(filter)
  def ingoing(filter: PropertyQuery): EdgeQuery =
    ingoing.intersect(filter.referencingEdges)
  def ingoing(filter: EdgeQuery): EdgeQuery = ingoing.intersect(filter)
  def ingoing(filter: VertexQuery): VertexQuery =
    ingoing.ingoing.intersect(filter)
}

object VertexQuery {
  case object All extends VertexQuery
  /** Point lookup; like the reference, listed ids are NOT existence-checked
    * (kv_graph_store.rs:151-155). */
  final case class Specific(ids: Seq[String]) extends VertexQuery
  final case class Property(pq: PropertyQuery) extends VertexQuery
  /** Target vertices (n2/dst) of the edge sub-query (kv_graph_store.rs:192-199). */
  final case class Out(eq: EdgeQuery) extends VertexQuery
  /** Source vertices (n1/src) of the edge sub-query (kv_graph_store.rs:200-207). */
  final case class In(eq: EdgeQuery) extends VertexQuery
  final case class Union(a: VertexQuery, b: VertexQuery) extends VertexQuery
  final case class Intersect(a: VertexQuery, b: VertexQuery) extends VertexQuery
  final case class Substract(a: VertexQuery, b: VertexQuery) extends VertexQuery
  /** Symmetric difference per the documented semantics
    * (docs/query_language.adoc:461-474). The reference's implementation
    * diverges and computes an intersection (kv_graph_store.rs:921-936);
    * we implement the documentation. */
  final case class DisjunctiveUnion(a: VertexQuery, b: VertexQuery) extends VertexQuery
  final case class Filter(q: VertexQuery, f: ZFilter) extends VertexQuery
  final case class Store(q: VertexQuery) extends VertexQuery

  def all: VertexQuery = All
  def fromIds(ids: Seq[String]): VertexQuery = Specific(ids)
  def fromProperty(pq: PropertyQuery): VertexQuery = Property(pq)
}

sealed trait EdgeQuery {
  def union(q: EdgeQuery): EdgeQuery = EdgeQuery.Union(this, q)
  def intersect(q: EdgeQuery): EdgeQuery = EdgeQuery.Intersect(this, q)
  def substract(q: EdgeQuery): EdgeQuery = EdgeQuery.Substract(this, q)
  def disjunctiveUnion(q: EdgeQuery): EdgeQuery = EdgeQuery.DisjunctiveUnion(this, q)
  def store: EdgeQuery = EdgeQuery.Store(this)
  def filter(f: ZFilter): EdgeQuery = EdgeQuery.Filter(this, f)
  /** Target (dst) vertices of these edges (ql.rs:165-167). */
  def outgoing: VertexQuery = VertexQuery.Out(this)
  /** Source (src) vertices of these edges (ql.rs:169-171). */
  def ingoing: VertexQuery = VertexQuery.In(this)

  // Lua-embedding sugar (lua.rs:180-263): filtered hops.
  /** Target vertices restricted to those carrying a property from `filter`. */
  def outgoing(filter: PropertyQuery): VertexQuery =
    outgoing.intersect(filter.referencingVertices)
  def outgoing(filter: VertexQuery): VertexQuery = outgoing.intersect(filter)
  def ingoing(filter: PropertyQuery): VertexQuery =
    ingoing.intersect(filter.referencingVertices)
  def ingoing(filter: VertexQuery): VertexQuery = ingoing.intersect(filter)
}

object EdgeQuery {
  case object All extends EdgeQuery
  /** Point lookup; like the reference, listed ids are NOT existence-checked
    * (kv_graph_store.rs:229-233) — unknown ids appear in the result set.
    * Documented divergence: hopping onward from an unknown id silently drops
    * it (null endpoints), where the reference's read_edge would abort the
    * whole query with an error — a distributed engine skips, not aborts. */
  final case class Specific(ids: Seq[String]) extends EdgeQuery
  final case class Property(pq: PropertyQuery) extends EdgeQuery
  /** Outgoing edges of the vertex sub-query (kv_graph_store.rs:271-285). */
  final case class Out(vq: VertexQuery) extends EdgeQuery
  /** Incoming edges of the vertex sub-query (kv_graph_store.rs:286-300). */
  final case class In(vq: VertexQuery) extends EdgeQuery
  final case class Union(a: EdgeQuery, b: EdgeQuery) extends EdgeQuery
  final case class Intersect(a: EdgeQuery, b: EdgeQuery) extends EdgeQuery
  final case class Substract(a: EdgeQuery, b: EdgeQuery) extends EdgeQuery
  final case class DisjunctiveUnion(a: EdgeQuery, b: EdgeQuery) extends EdgeQuery
  final case class Filter(q: EdgeQuery, f: ZFilter) extends EdgeQuery
  final case class Store(q: EdgeQuery) extends EdgeQuery

  def all: EdgeQuery = All
  def fromIds(ids: Seq[String]): EdgeQuery = Specific(ids)
  def fromProperty(pq: PropertyQuery): EdgeQuery = Property(pq)
}

sealed trait PropertyQuery {
  /** Parent properties whose `nested()` includes this result
    * (kv_graph_store.rs:341-347). */
  def referencingProperties: PropertyQuery = PropertyQuery.ReferencingProperties(this)
  /** Child properties of this result; declared-but-unimplemented in the
    * reference (kv_graph_store.rs:348-350) — implemented here. */
  def referencedProperties: PropertyQuery = PropertyQuery.ReferencedProperties(this)
  def referencingVertices: VertexQuery = VertexQuery.Property(this)
  def referencingEdges: EdgeQuery = EdgeQuery.Property(this)
}

object PropertyQuery {
  final case class Specific(id: String) extends PropertyQuery
  /** Inclusive key range [from, to] over property keys — supports custom
    * orderable keys (kv_graph_store.rs:429-447, filter `< from || > to`). */
  final case class FromTo(from: String, to: String) extends PropertyQuery
  final case class ReferencingProperties(pq: PropertyQuery) extends PropertyQuery
  final case class ReferencedProperties(pq: PropertyQuery) extends PropertyQuery

  def fromId(id: String): PropertyQuery = Specific(id)
  def fromTo(a: String, b: String): PropertyQuery = FromTo(a, b)
}

sealed trait BasicQuery
object BasicQuery {
  final case class V(q: VertexQuery) extends BasicQuery
  final case class E(q: EdgeQuery) extends BasicQuery
  final case class P(q: PropertyQuery) extends BasicQuery
}

/** Filter slot. The reference declares a ShellFilter (interpreter+script,
  * exit code decides; ql.rs:354-358) but never executes it
  * (kv_graph_store.rs:208,301 are unreachable!()). We keep the wire shape
  * and interpret two engine-native interpreters instead of spawning
  * subprocesses:
  *  - "sql": `script` is a boolean SQL expression over columns
  *    (id, value, schema_type) of the element joined with its property —
  *    declarative, stays inside whole-stage codegen;
  *  - "registry": `script` names a predicate registered in
  *    [[graft.exec.FilterRegistry]].
  */
final case class ZFilter(interpreter: String, script: String)

object Zoe {
  /** Schema-value entry point, mirroring `Property::start()` (schema.rs:8-14):
    * a typed value becomes a Specific property-key query. */
  def start(p: PropValue): PropertyQuery = PropertyQuery.Specific(p.hash)
  /** `from_to` over custom orderable keys (schema.rs:16-20). */
  def fromTo(a: PropValue, b: PropValue): PropertyQuery =
    PropertyQuery.FromTo(a.hash, b.hash)
}
