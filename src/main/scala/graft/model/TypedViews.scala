package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed row views over the graph tables, for callers who want compile-time
  * field checks (`Dataset[Vertex]`) instead of dynamic DataFrames — the
  * Spark analogue of the reference's typed `Property` trait surface. */
final case class Vertex(id: String, prop_hash: String)
final case class GraphEdge(edge_id: String, src: String, dst: String, prop_hash: String)
final case class Prop(hash: String, value: String, schema_type: String)
final case class PropRef(parent_hash: String, child_hash: String)

object TypedViews {
  def vertices(g: GraphStore): Dataset[Vertex] = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    g.vertices.as[Vertex]
  }
  def edges(g: GraphStore): Dataset[GraphEdge] = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    g.edges.as[GraphEdge]
  }
  def props(g: GraphStore): Dataset[Prop] = {
    val spark = g.props.sparkSession
    import spark.implicits._
    g.props.as[Prop]
  }
  def propRefs(g: GraphStore): Dataset[PropRef] = {
    val spark = g.propRefs.sparkSession
    import spark.implicits._
    g.propRefs.as[PropRef]
  }

  /** Register the four tables as temp views (`<prefix>vertices`, `...edges`,
    * `...props`, `...prop_refs`) so the whole graph is queryable through
    * `spark.sql` — Spark SQL is this engine's ad-hoc query surface, the
    * role the Lua REPL plays in the reference (SURVEY §2.7). */
  def registerViews(g: GraphStore, prefix: String = "graft_"): Unit = {
    g.vertices.createOrReplaceTempView(s"${prefix}vertices")
    g.edges.createOrReplaceTempView(s"${prefix}edges")
    g.props.createOrReplaceTempView(s"${prefix}props")
    g.propRefs.createOrReplaceTempView(s"${prefix}prop_refs")
  }
}
