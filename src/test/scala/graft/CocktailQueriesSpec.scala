package graft

import org.apache.spark.sql.functions._
import graft.exec.ZoeCompiler
import graft.model.PropValue
import graft.ql._

/** End-to-end Zoe query corpus over the cocktail graph, asserting the same
  * oracles as the reference's backend-parametric scenarios
  * (gravitydb-test-utils/src/lib.rs:7-315). */
class CocktailQueriesSpec extends SparkSuite {

  lazy val (batch, ids) = CocktailFixture.build()
  lazy val g = batch.toStore(spark).persistAll()
  lazy val zc = new ZoeCompiler(g)

  private def prop(variant: String, payload: String = "") = CocktailFixture.prop(variant, payload)

  /** extract_properties as a sorted list of canonical property JSON. */
  private def extracted(q: VertexQuery): Seq[String] =
    zc.extractProperties(zc.run(q)).collect().map(_.getString(0)).toSeq.sorted

  test("trivial_queries: no teacup in a cocktail bar") {
    val q = Zoe.start(prop("Glass", "teacup")).referencingVertices
    assert(extracted(q).isEmpty)
  }

  test("trivial_queries: one Cocktail glass") {
    val q = Zoe.start(prop("Glass", "Cocktail glass")).referencingVertices
    assert(extracted(q) == Seq("""{"Glass":"Cocktail glass"}"""))
  }

  test("alexander_ingredients: two variants, shared and distinct ingredients") {
    val alexander = Zoe.start(prop("Cocktail", "Alexander")).referencingVertices
    val r = zc.run(alexander)
    val vs = r.vertices.collect().map(_.getString(0)).toSeq
    assert(vs.size == 2)

    def ingredientsOf(v: String): VertexQuery =
      VertexQuery.fromIds(Seq(v)).outgoing
        .intersect(Zoe.start(prop("Includes")).referencingEdges)
        .outgoing
    val Seq(v1, v2) = vs
    val common = extracted(ingredientsOf(v1).intersect(ingredientsOf(v2)))
    assert(common == Seq(
      """{"Garnish":"nutmeg"}""",
      """{"Ingredient":"cream"}""",
      """{"Ingredient":"crème de cacao"}"""))

    val d1 = extracted(ingredientsOf(v1).substract(ingredientsOf(v2)))
    val d2 = extracted(ingredientsOf(v2).substract(ingredientsOf(v1)))
    val bases = Set(d1, d2)
    assert(bases == Set(
      Seq("""{"Ingredient":"gin"}"""),
      Seq("""{"Ingredient":"cognac"}""")))
  }

  val expectedGinCocktails: Seq[String] = Seq(
    "Alexander", "Angel face", "Aviation", "Casino", "Clover Club",
    "Dry Martini", "Gin fizz", "Golden fizz", "Hanky panky", "John Collins",
    "Last Word", "Martini", "Monkey Gland", "Negroni", "Paradise",
    "Ramos gin fizz", "Royal fizz", "Silver fizz", "Tuxedo", "White lady",
    "maiden's prayer").map(n => s"""{"Cocktail":"$n"}""").sorted

  test("which_cocktails_include_gin: 21 cocktails, 3 equivalent plans, paths") {
    val gin = Zoe.start(prop("Ingredient", "gin"))
    val cocktailType = Zoe.start(PropValue.schemaType("Cocktail"))
    val includes = Zoe.start(prop("Includes"))

    val q1 = gin.referencingVertices.ingoing
      .intersect(includes.referencingEdges)
      .ingoing
      .intersect(cocktailType.referencingProperties.referencingVertices)
    assert(extracted(q1) == expectedGinCocktails)

    // paths: every path is [gin, Includes, cocktail]
    val paths = zc.extractPathProperties(zc.run(q1))
      .collect().map(_.getSeq[String](1).toList).toSeq
    assert(paths.size == 21)
    val expectedPaths = expectedGinCocktails.map(c =>
      List("""{"Ingredient":"gin"}""", "\"Includes\"", c)).toSet
    assert(paths.toSet == expectedPaths)

    // same result from the cocktail side
    val q2 = cocktailType.referencingProperties.referencingVertices
      .intersect(gin.referencingVertices.ingoing
        .intersect(includes.referencingEdges)
        .ingoing)
    assert(extracted(q2) == expectedGinCocktails)

    // and from the edges side
    val q3 = includes.referencingEdges.ingoing
      .intersect(gin.referencingVertices.ingoing.ingoing)
      .intersect(cocktailType.referencingProperties.referencingVertices)
    assert(extracted(q3) == expectedGinCocktails)
  }

  test("cocktail_statistic: host-level aggregation oracle") {
    // one traversal for ALL cocktails: cocktail -> Includes edge -> target;
    // the originating cocktail is path[0].v (SURVEY.md §2.8: aggregation
    // happens in the host engine, here as DataFrame aggregation)
    val cocktailType = Zoe.start(PropValue.schemaType("Cocktail"))
    val allCocktails = cocktailType.referencingProperties.referencingVertices
    val q = allCocktails.outgoing
      .intersect(Zoe.start(prop("Includes")).referencingEdges)
      .outgoing

    val trace = zc.traceV(q)
      .select(col("path").getItem(0).getField("v").as("cocktail"), col("id").as("target"))
      .distinct() // distinct ingredient vertices per cocktail, like the reference's HashSet
    val typed = trace
      .join(g.vertices.withColumnRenamed("id", "target"), Seq("target"))
      .join(g.props, col("prop_hash") === col("hash"))
      .select(col("cocktail"), col("target"), col("schema_type"), col("value"))
      .cache()

    val perCocktail = zc.run(allCocktails).vertices
      .withColumnRenamed("id", "cocktail")
      .join(typed.groupBy("cocktail").agg(
        sum(when(col("schema_type") === "Ingredient", 1).otherwise(0)).as("i_cnt"),
        sum(when(col("schema_type") === "Garnish", 1).otherwise(0)).as("g_cnt"),
        sum(when(!col("schema_type").isin("Ingredient", "Garnish"), 1).otherwise(0)).as("o_cnt")),
        Seq("cocktail"), "left")
      .na.fill(0, Seq("i_cnt", "g_cnt", "o_cnt"))
      .cache()

    val stats = perCocktail.agg(
      min("i_cnt"), max("i_cnt"), min("g_cnt"), max("g_cnt"),
      sum("o_cnt"), avg("i_cnt"), avg("g_cnt"), count(lit(1))).collect()(0)
    assert(stats.getLong(0) == 1L)   // min ingredients
    assert(stats.getLong(1) == 9L)   // max ingredients
    assert(stats.getLong(2) == 0L)   // min garnishes
    assert(stats.getLong(3) == 2L)   // max garnishes
    assert(stats.getLong(4) == 0L)   // nothing else ever goes in a cocktail
    assert(stats.getLong(7) == 45L)  // 45 cocktails
    assert(f"${stats.getDouble(5)}%.3f" == "3.578")
    assert(f"${stats.getDouble(6)}%.3f" == "0.844")

    // top-5 most used ingredients, count desc / name asc tiebreak
    val top5 = typed.where(col("schema_type") === "Ingredient")
      .select(get_json_object(col("value"), "$.Ingredient").as("name"))
      .groupBy("name").count()
      .orderBy(desc("count"), asc("name"))
      .limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top5 == Seq(
      ("gin", 21L), ("lemon juice", 16L), ("sugar syrup", 8L),
      ("club soda", 7L), ("maraschino", 7L)))
  }

  test("wire-format query execution: JSON Zoe in, same result") {
    val gin = Zoe.start(prop("Ingredient", "gin"))
    val includes = Zoe.start(prop("Includes"))
    val cocktailType = Zoe.start(PropValue.schemaType("Cocktail"))
    val q1 = gin.referencingVertices.ingoing
      .intersect(includes.referencingEdges)
      .ingoing
      .intersect(cocktailType.referencingProperties.referencingVertices)
    val viaJson = ZoeJson.parse(ZoeJson.render(BasicQuery.V(q1)))
    val r = zc.run(viaJson.asInstanceOf[BasicQuery.V].q)
    assert(r.vertices.count() == 21)
  }

  test("edge filter and store operators") {
    // E.Filter with the sql interpreter: 45 ServedIn edges
    val served = zc.run(EdgeQuery.all.filter(ZFilter("sql", "schema_type = 'ServedIn'")))
    assert(served.edges.count() == 45)
    // E.Store snapshots the selection into every context's e_store
    val stored = zc.run(EdgeQuery.all
      .intersect(Zoe.start(prop("ServedIn")).referencingEdges).store)
    assert(stored.edges.count() == 45)
    // E.Specific is NOT existence-checked (reference parity,
    // kv_graph_store.rs:229-233): ghost ids surface in the result set...
    val some = zc.run(EdgeQuery.fromIds(Seq(g.edges.head().getString(0), "GHOST")))
    assert(some.edges.count() == 2)
    assert(some.edges.where(col("id") === "GHOST").count() == 1)
    // ...but hops drop them (null endpoints; the reference's read_edge errors)
    val hopped = zc.run(EdgeQuery.fromIds(Seq(g.edges.head().getString(0), "GHOST")).ingoing)
    assert(hopped.vertices.count() == 1)
  }

  test("store survival follows the carrying contexts (reference parity)") {
    // stored snapshot survives when at least one carrying row survives
    val served = Zoe.start(prop("ServedIn")).referencingEdges
    val kept = zc.run(EdgeQuery.all.intersect(served).store)
    assert(kept.edges.count() == 45)
    // subtracting ALL carrying elements drops the snapshot with them
    val dropped = zc.run(EdgeQuery.all.intersect(served).store.substract(EdgeQuery.all))
    assert(dropped.edges.count() == 0)
  }
}
