package graft.model

/** The `#[derive(Schema)]` surface (gravitydb_derive/src/lib.rs:10-94)
  * realized for Scala sealed traits: mix [[SchemaEnum]] into an ADT and
  * every variant derives its schema-type chain from the CASE CLASS NAME
  * ALONE — no per-variant boilerplate, exactly what the proc-macro buys a
  * Rust user. Scala has no compile-plugin step in this build, but the
  * compiler already generates the static variant metadata the macro reads
  * from the AST (`productPrefix` = variant identifier, `productArity` /
  * `productElementNames` = the fields), so the derivation is reflection-free
  * and allocation-light at call time.
  *
  * Parity with the macro's expansion and its trybuild suite:
  *  - `nested` = `[SchemaType(variantName)]` (test 01/02/03)
  *  - a variant NAMED `SchemaType` nests nothing — the lattice does not
  *    recurse (test 03, lib.rs:25-30)
  *  - `additionalTypes` ≙ `#[schema(additional_types = A, B)]`: extra
  *    static labels appended after the base type (test 04)
  *  - `customTypes` ≙ `#[schema(custom = fn)]`: value-DEPENDENT labels,
  *    computed from the variant's own fields (test 05)
  *  - unit variants carry no payload, newtype variants carry their single
  *    field, struct variants serialize their fields as a canonical JSON
  *    object (serde struct-variant shape)
  *
  * `toProp` lands on the same [[PropValue]] content hashes as hand-written
  * `PropValue.typed(...)` calls, so derived schemas interoperate with every
  * existing store and query unchanged.
  */
trait SchemaEnum extends Product {

  /** Extra STATIC schema-type labels for this variant
    * (`#[schema(additional_types = ...)]`). */
  def additionalTypes: Seq[String] = Nil

  /** Extra VALUE-DEPENDENT schema-type labels
    * (`#[schema(custom = some_fn)]` — the fn received the variant's
    * fields; here the variant computes from them directly). */
  def customTypes: Seq[String] = Nil

  /** The derive expansion: base SchemaType(variant) + additional + custom;
    * empty for the `SchemaType` variant itself (never recursive). */
  final def nested: Seq[PropValue] =
    if (productPrefix == "SchemaType") Nil
    else (productPrefix +: (additionalTypes ++ customTypes))
      .map(PropValue.schemaType)

  /** Serde-compatible payload: None for unit variants, the single field
    * for newtype variants, a canonical JSON object for struct variants. */
  final def payload: Option[String] = productArity match {
    case 0 => None
    case 1 => Some(jsonScalar(productElement(0), bare = true))
    case _ =>
      val fields = productElementNames.zip(productIterator).map {
        case (k, v) => s"${PropValue.jsonString(k)}:${jsonScalar(v, bare = false)}"
      }
      Some(fields.mkString("{", ",", "}"))
  }

  /** The content-addressed property this variant value denotes — hash-equal
    * to `PropValue.typed(name, payload)` for plain variants, so derived and
    * hand-written schemas share one property space. */
  final def toProp: PropValue =
    PropValue(productPrefix, payload, nested)

  /** serde scalar rendering: strings escape+quote (bare newtype payloads
    * stay raw — PropValue.json quotes them), numbers/booleans unquoted. */
  private def jsonScalar(v: Any, bare: Boolean): String = v match {
    case s: String => if (bare) s else PropValue.jsonString(s)
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double => if (d == math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString
    case f: Float => jsonScalar(f.toDouble, bare)
    case o: Option[_] => o.map(jsonScalar(_, bare)).getOrElse("null")
    case other => if (bare) other.toString else PropValue.jsonString(other.toString)
  }
}
