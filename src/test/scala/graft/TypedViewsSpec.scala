package graft

import graft.model.{PropValue, TypedViews}
import graft.store.GraphBatch

class TypedViewsSpec extends SparkSuite {

  lazy val g = {
    val b = new GraphBatch
    val a = b.createNode(PropValue.typed("Thing", Some("x")))
    val c = b.createNode(PropValue.typed("Thing", Some("y")))
    b.createEdge(a, c, PropValue("Link"))
    b.toStore(spark)
  }

  test("typed Dataset views expose the tables with case-class rows") {
    assert(TypedViews.vertices(g).collect().map(_.id).length == 2)
    val e = TypedViews.edges(g).head()
    assert(e.edge_id.length == 64 && e.prop_hash == PropValue("Link").hash)
    assert(TypedViews.props(g).collect().map(_.schema_type).toSet ==
      Set("Thing", "Link", "SchemaType"))
    // two Thing props nest SchemaType(Thing); the bare Link prop nests nothing
    assert(TypedViews.propRefs(g).count() == 2)
  }

  test("spark.sql over registered graph views") {
    TypedViews.registerViews(g)
    val row = spark.sql(
      """SELECT p.value, count(*) AS n
        |FROM graft_vertices v JOIN graft_props p ON v.prop_hash = p.hash
        |GROUP BY p.value ORDER BY p.value""".stripMargin).collect()
    assert(row.length == 2)
    assert(row.head.getString(0) == """{"Thing":"x"}""")
    val hop = spark.sql(
      """SELECT count(*) FROM graft_edges e
        |JOIN graft_vertices s ON e.src = s.id
        |JOIN graft_vertices d ON e.dst = d.id""".stripMargin).head().getLong(0)
    assert(hop == 1)
  }
}
