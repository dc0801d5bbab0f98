package graft

import graft.model.{PropValue, SchemaEnum}

/** The `#[derive(Schema)]` parity suite — each test mirrors one trybuild
  * case from gravitydb_derive/tests (01-parse-simple through
  * 05-customize-schema-types) plus hash-level interop with the hand-written
  * `PropValue.typed` path. */
class SchemaDeriveSpec extends SparkSuite {

  // 01-parse-simple.rs: the cocktail schema declares with zero boilerplate
  sealed trait CocktailSchema extends SchemaEnum
  case class Cocktail(name: String) extends CocktailSchema
  case class Ingredient(name: String) extends CocktailSchema
  case class Garnish(name: String) extends CocktailSchema
  case class Glass(name: String) extends CocktailSchema
  case object Includes extends CocktailSchema
  case object ServedIn extends CocktailSchema
  case class SchemaType(label: String) extends CocktailSchema

  // 02/03/04/05: the PIM schema with struct variant, additional and custom
  sealed trait PimSchema extends SchemaEnum
  case class Person(name: String, surname: String, isMale: Boolean) extends PimSchema {
    // 05-customize-schema-types.rs: value-dependent labels from the fields
    override def customTypes: Seq[String] = Seq(if (isMale) "Male" else "Female")
  }
  case object Manager extends PimSchema {
    // 04-additional-schema-types.rs
    override def additionalTypes: Seq[String] = Seq("Person", "Vertex")
  }
  case class Email(addr: String) extends PimSchema
  case class Organisation(name: String) extends PimSchema
  case object BelongsTo extends PimSchema {
    override def additionalTypes: Seq[String] = Seq("Connection")
  }
  case class PimSchemaType(label: String) extends PimSchema

  private def labels(p: SchemaEnum): Seq[String] =
    p.nested.map(_.payload.get)

  test("01/02: variants parse — unit, newtype and struct forms derive") {
    assert(Includes.toProp == PropValue("Includes", None, Seq(PropValue.schemaType("Includes"))))
    assert(Ingredient("gin").toProp.variant == "Ingredient")
    assert(Ingredient("gin").toProp.payload.contains("gin"))
    val p = Person("John", "Doe", isMale = true).toProp
    assert(p.payload.contains("""{"name":"John","surname":"Doe","isMale":true}"""))
  }

  test("03: SchemaType is not recursive — nested() is empty for it") {
    assert(labels(Email("example@email.com")) == Seq("Email"))
    assert(SchemaType("Person").nested.isEmpty)
    assert(SchemaType("Person").toProp == PropValue("SchemaType", Some("Person")))
  }

  test("04: additional_types append after the base label") {
    assert(labels(Manager) == Seq("Manager", "Person", "Vertex"))
    assert(labels(BelongsTo) == Seq("BelongsTo", "Connection"))
  }

  test("05: custom types compute from the variant's own fields") {
    assert(labels(Person("John", "Doe", isMale = true)) == Seq("Person", "Male"))
    assert(labels(Person("Jane", "Doe", isMale = false)) == Seq("Person", "Female"))
  }

  test("derived props hash-match hand-written PropValue.typed exactly") {
    // one property space: a store built from derived values is queryable
    // by code that constructs PropValue.typed by hand (and vice versa)
    assert(Ingredient("gin").toProp == PropValue.typed("Ingredient", Some("gin")))
    assert(Includes.toProp == PropValue.typed("Includes"))
    assert(Ingredient("gin").toProp.hash == PropValue.typed("Ingredient", Some("gin")).hash)
  }

  test("derived schema round-trips through the store and Zoe queries") {
    val b = new graft.store.GraphBatch
    val gin = b.createNode(Ingredient("gin").toProp)
    val fizz = b.createNode(Cocktail("Gin fizz").toProp)
    b.createEdge(fizz, gin, Includes.toProp)
    val g = b.toStore(spark)
    val zc = new graft.exec.ZoeCompiler(g)
    // query with the HAND-WRITTEN constructor against the DERIVED store:
    // in-edges of gin, then their SOURCE vertices (.ingoing) = the cocktail
    val q = graft.ql.Zoe.start(PropValue.typed("Ingredient", Some("gin")))
      .referencingVertices.ingoing.ingoing
    assert(zc.run(q).vertices.collect().map(_.getString(0)).toSeq == Seq(fizz))
    // the typed lattice is there: SchemaType("Ingredient") reaches gin
    val byType = graft.ql.Zoe.start(PropValue.schemaType("Ingredient"))
      .referencingProperties.referencingVertices
    assert(zc.run(byType).vertices.collect().map(_.getString(0)).toSeq == Seq(gin))
  }
}
