package graft.exec

import graft.model.GraphStore
import graft.ql.{BasicQuery, ZoeJson}

/** Declarative schema constraints, realizing the reference's declared-but-
  * never-enforced `SchemaConstraint` (schema.rs:30-33, docs/schema.adoc:
  * 174-199): a Required constraint must match at least one element, a
  * Prohibited one must match none. Intended to run at batch-commit
  * boundaries (the reference's transaction-commit intent). */
sealed trait SchemaConstraint { def query: BasicQuery }
object SchemaConstraint {
  final case class Required(query: BasicQuery) extends SchemaConstraint
  final case class Prohibited(query: BasicQuery) extends SchemaConstraint
}

object SchemaValidator {
  final case class Violation(kind: String, query: String, matches: Long)

  private def matchCount(zc: ZoeCompiler, q: BasicQuery): Long = {
    val r = zc.run(q)
    r.vertices.count() + r.edges.count() + r.properties.count()
  }

  /** Evaluate all constraints against the store; empty result = valid. */
  def validate(g: GraphStore, constraints: Seq[SchemaConstraint]): Seq[Violation] = {
    val zc = new ZoeCompiler(g)
    constraints.flatMap {
      case SchemaConstraint.Required(q) =>
        val n = matchCount(zc, q)
        if (n == 0) Some(Violation("required", ZoeJson.render(q), n)) else None
      case SchemaConstraint.Prohibited(q) =>
        val n = matchCount(zc, q)
        if (n > 0) Some(Violation("prohibited", ZoeJson.render(q), n)) else None
    }
  }

  def enforce(g: GraphStore, constraints: Seq[SchemaConstraint]): Unit = {
    val vs = validate(g, constraints)
    if (vs.nonEmpty) throw new IllegalStateException(
      "schema constraints violated: " + vs.map(v => s"${v.kind} ${v.query} (matches=${v.matches})").mkString("; "))
  }
}
