package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.exec.ZoeCompiler
import graft.model.PropValue
import graft.ql._
import graft.store.GraphBatch

/** Property-based check of the traversal algebra: random small graphs and
  * random query ASTs, with a pure-Scala model interpreter of the reference
  * semantics as the oracle (SURVEY §5 "ScalaCheck set-op algebra vs model").
  */
/** Path-element shape for synthetic paths frames (fields v/e must match the
  * compiler's path struct); top-level so Spark can derive its encoder. */
case class ZoeAlgebraHop(v: String, e: String)

class ZoeAlgebraSpec extends SparkSuite {

  /** Driver-side model of the store: node id -> prop hash, edge id ->
    * (src, dst, prop hash), prop key set, nested() refs. */
  final case class Model(
      nodes: Map[String, String],
      edges: Map[String, (String, String, String)],
      propKeys: Set[String],
      refs: Set[(String, String)]) {

    def evalP(q: PropertyQuery): Set[String] = q match {
      case PropertyQuery.Specific(id)  => propKeys.intersect(Set(id))
      case PropertyQuery.FromTo(a, b)  => propKeys.filter(k => k >= a && k <= b)
      case PropertyQuery.ReferencingProperties(pq) =>
        val c = evalP(pq); refs.collect { case (p, ch) if c(ch) => p }
      case PropertyQuery.ReferencedProperties(pq) =>
        val c = evalP(pq); refs.collect { case (p, ch) if c(p) => ch }
    }

    def evalV(q: VertexQuery): Set[String] = q match {
      case VertexQuery.All            => nodes.keySet
      case VertexQuery.Specific(ids)  => ids.toSet // not existence-checked (parity)
      case VertexQuery.Property(pq)   => val h = evalP(pq); nodes.collect { case (n, p) if h(p) => n }.toSet
      case VertexQuery.Out(eq)        => evalE(eq).map(e => edges(e)._2)
      case VertexQuery.In(eq)         => evalE(eq).map(e => edges(e)._1)
      case VertexQuery.Union(a, b)    => evalV(a) union evalV(b)
      case VertexQuery.Intersect(a, b) => evalV(a) intersect evalV(b)
      case VertexQuery.Substract(a, b) => evalV(a) diff evalV(b)
      case VertexQuery.DisjunctiveUnion(a, b) =>
        val (x, y) = (evalV(a), evalV(b)); (x diff y) union (y diff x)
      case VertexQuery.Store(s)       => evalV(s) // snapshot == selection
      case VertexQuery.Filter(_, _)   => sys.error("not generated")
    }

    def evalE(q: EdgeQuery): Set[String] = q match {
      case EdgeQuery.All              => edges.keySet
      case EdgeQuery.Specific(ids)    => ids.toSet.intersect(edges.keySet)
      case EdgeQuery.Property(pq)     => val h = evalP(pq); edges.collect { case (e, (_, _, p)) if h(p) => e }.toSet
      case EdgeQuery.Out(vq)          => val v = evalV(vq); edges.collect { case (e, (s, _, _)) if v(s) => e }.toSet
      case EdgeQuery.In(vq)           => val v = evalV(vq); edges.collect { case (e, (_, d, _)) if v(d) => e }.toSet
      case EdgeQuery.Union(a, b)      => evalE(a) union evalE(b)
      case EdgeQuery.Intersect(a, b)  => evalE(a) intersect evalE(b)
      case EdgeQuery.Substract(a, b)  => evalE(a) diff evalE(b)
      case EdgeQuery.DisjunctiveUnion(a, b) =>
        val (x, y) = (evalE(a), evalE(b)); (x diff y) union (y diff x)
      case EdgeQuery.Store(s)         => evalE(s)
      case EdgeQuery.Filter(_, _)     => sys.error("not generated")
    }
  }

  private val vertexProps = Seq("red", "green", "blue").map(c => PropValue.typed("Color", Some(c)))
  private val edgeProps = Seq("likes", "knows").map(PropValue.typed(_))

  private def buildGraph(nNodes: Int, edgeSeed: Seq[(Int, Int, Int)]): (GraphBatch, Model) = {
    val b = new GraphBatch
    val ids = (0 until nNodes).map { i => b.createNode(s"n$i", vertexProps(i % 3)) }
    val edgeIds = edgeSeed.map { case (s, d, p) =>
      b.createEdge(ids(s % nNodes), ids(d % nNodes), edgeProps(p % 2))
    }
    val model = Model(
      nodes = ids.zipWithIndex.map { case (id, i) => id -> vertexProps(i % 3).hash }.toMap,
      edges = edgeIds.zip(edgeSeed).map { case (eid, (s, d, p)) =>
        eid -> (ids(s % nNodes), ids(d % nNodes), edgeProps(p % 2).hash)
      }.toMap,
      propKeys = (vertexProps ++ edgeProps).flatMap(_.withNested).map(_.hash).toSet,
      refs = (vertexProps ++ edgeProps).flatMap(p => p.nested.map(c => (p.hash, c.hash))).toSet)
    (b, model)
  }

  private def genP(depth: Int): Gen[PropertyQuery] = {
    val leaf = Gen.oneOf(
      Gen.oneOf(vertexProps ++ edgeProps).map(p => PropertyQuery.Specific(p.hash)),
      Gen.const(PropertyQuery.Specific("NOPE")),
      for { a <- Gen.oneOf(vertexProps); b <- Gen.oneOf(vertexProps) }
        yield PropertyQuery.FromTo(Seq(a.hash, b.hash).min, Seq(a.hash, b.hash).max))
    if (depth == 0) leaf
    else Gen.frequency(
      3 -> leaf,
      1 -> genP(depth - 1).map(_.referencingProperties),
      1 -> genP(depth - 1).map(_.referencedProperties))
  }

  private def genV(depth: Int): Gen[VertexQuery] = {
    val leaf: Gen[VertexQuery] = Gen.oneOf(
      Gen.const(VertexQuery.All),
      Gen.someOf(Seq("n0", "n1", "n2", "ghost")).map(ids => VertexQuery.Specific(ids.toSeq)),
      genP(1).map(VertexQuery.Property))
    if (depth == 0) leaf
    else Gen.frequency(
      2 -> leaf,
      2 -> genE(depth - 1).map(VertexQuery.Out),
      2 -> genE(depth - 1).map(VertexQuery.In),
      1 -> Gen.zip(genV(depth - 1), genV(depth - 1)).map(t => VertexQuery.Union(t._1, t._2)),
      1 -> Gen.zip(genV(depth - 1), genV(depth - 1)).map(t => VertexQuery.Intersect(t._1, t._2)),
      1 -> Gen.zip(genV(depth - 1), genV(depth - 1)).map(t => VertexQuery.Substract(t._1, t._2)),
      1 -> Gen.zip(genV(depth - 1), genV(depth - 1)).map(t => VertexQuery.DisjunctiveUnion(t._1, t._2)),
      1 -> genV(depth - 1).map(VertexQuery.Store))
  }

  /** Edge-id candidates for E.Specific leaves (filled per test graph). */
  @volatile private var edgeIdPool: Seq[String] = Seq("GHOST")

  private def genE(depth: Int): Gen[EdgeQuery] = {
    val leaf: Gen[EdgeQuery] = Gen.oneOf(
      Gen.const(EdgeQuery.All),
      Gen.someOf(edgeIdPool).map(ids => EdgeQuery.Specific(ids.toSeq)),
      genP(1).map(EdgeQuery.Property))
    if (depth == 0) leaf
    else Gen.frequency(
      2 -> leaf,
      2 -> genV(depth - 1).map(EdgeQuery.Out),
      2 -> genV(depth - 1).map(EdgeQuery.In),
      1 -> Gen.zip(genE(depth - 1), genE(depth - 1)).map(t => EdgeQuery.Union(t._1, t._2)),
      1 -> Gen.zip(genE(depth - 1), genE(depth - 1)).map(t => EdgeQuery.Intersect(t._1, t._2)),
      1 -> Gen.zip(genE(depth - 1), genE(depth - 1)).map(t => EdgeQuery.Substract(t._1, t._2)),
      1 -> genE(depth - 1).map(EdgeQuery.Store))
  }

  test("compiled traversals agree with the model interpreter on random graphs/queries") {
    val (batch, model) = buildGraph(6,
      Seq((0, 1, 0), (1, 2, 1), (2, 3, 0), (3, 4, 1), (4, 5, 0), (5, 0, 1),
        (0, 3, 0), (1, 4, 1), (2, 2, 0)))
    val zc = new ZoeCompiler(batch.toStore(spark).persistAll())
    edgeIdPool = model.edges.keys.take(3).toSeq :+ "GHOST"

    (1 to 12).foreach { i =>
      val q = genV(3).pureApply(Gen.Parameters.default, Seed(i.toLong))
      val got = zc.run(q).vertices.collect().map(_.getString(0)).toSet
      assert(got == model.evalV(q), s"\nseed $i query: $q")
    }
    (101 to 112).foreach { i =>
      val q = genE(3).pureApply(Gen.Parameters.default, Seed(i.toLong))
      val got = zc.run(q).edges.collect().map(_.getString(0)).toSet
      assert(got == model.evalE(q), s"\nseed $i query: $q")
    }
  }

  test("algebraic laws hold on the compiled plans") {
    val (batch, model) = buildGraph(5, Seq((0, 1, 0), (1, 2, 1), (3, 4, 0), (2, 0, 1)))
    val zc = new ZoeCompiler(batch.toStore(spark).persistAll())
    def ids(q: VertexQuery): Set[String] = zc.run(q).vertices.collect().map(_.getString(0)).toSet
    val a = Zoe.start(vertexProps(0)).referencingVertices
    val b = VertexQuery.Specific(Seq("n0", "n1", "ghost"))
    assert(ids(a.union(b)) == ids(b.union(a)))
    assert(ids(a.intersect(b)) == ids(b.intersect(a)))
    assert(ids(a.substract(b)) == (ids(a) diff ids(b)))
    assert(ids(a.disjunctiveUnion(b)) == (ids(a.union(b)) diff ids(a.intersect(b))))
    assert(ids(a.union(a)) == ids(a))
    assert(ids(a.intersect(a)) == ids(a))
    assert(ids(a.substract(a)).isEmpty)
    assert(model.evalV(a) == ids(a))
  }

  test("wire codec round-trips random query ASTs") {
    (1 to 40).foreach { i =>
      val v = genV(4).pureApply(Gen.Parameters.default, Seed(1000L + i))
      val q = BasicQuery.V(v)
      assert(ZoeJson.parse(ZoeJson.render(q)) == q, s"seed $i")
      val e = genE(4).pureApply(Gen.Parameters.default, Seed(2000L + i))
      val qe = BasicQuery.E(e)
      assert(ZoeJson.parse(ZoeJson.render(qe)) == qe, s"seed $i")
    }
  }

  test("extractPathProperties matches a driver-side assembly on random paths") {
    // Fuzz the FUSED path assembly (start/end sentinels riding the exploded
    // hop frame) directly: random paths referencing a mix of real ids,
    // ghosts, and nulls, against a pure-driver reference of the layout
    // [startEdgeProp?] ++ hops.flatMap(v,e => [vProp?, eProp?]) ++
    // [endVertexProp?] (kv_graph_store.rs:108-137 — missing elements and
    // property-less lookups vanish, everything else keeps hop order).
    import spark.implicits._
    val (batch, model) = buildGraph(5,
      Seq((0, 1, 0), (1, 2, 1), (2, 3, 0), (3, 4, 1), (4, 0, 0), (1, 3, 1)))
    val zc = new ZoeCompiler(batch.toStore(spark).persistAll())
    val vIds = model.nodes.keys.toVector.sorted
    val eIds = model.edges.keys.toVector.sorted
    val valueByHash = (vertexProps ++ edgeProps).map(p => p.hash -> p.json).toMap
    def lookupV(id: String): Option[String] =
      Option(id).flatMap(model.nodes.get).flatMap(valueByHash.get)
    def lookupE(id: String): Option[String] =
      Option(id).flatMap(model.edges.get).map(_._3).flatMap(valueByHash.get)

    val rnd = new scala.util.Random(4242L)
    def randV() = if (rnd.nextInt(6) == 0) "ghostV" else vIds(rnd.nextInt(vIds.size))
    def randE() = if (rnd.nextInt(6) == 0) "ghostE" else eIds(rnd.nextInt(eIds.size))
    val rows = Seq.fill(80) {
      val start = rnd.nextInt(4) match { case 0 => null; case _ => randE() }
      val hops = Seq.fill(rnd.nextInt(4))(ZoeAlgebraHop(randV(), randE()))
      val end = rnd.nextInt(4) match { case 0 => null; case _ => randV() }
      (start, hops, end)
    } :+ ((null, Seq.empty[ZoeAlgebraHop], null)) :+ ((null, Seq.empty[ZoeAlgebraHop], null)) // dup empties

    val dummy = Seq.empty[String].toDF("id")
    val r = graft.exec.ZoeResult(dummy, dummy, rows.toDF("start", "path", "end"),
      dummy, Seq.empty[(String, String)].toDF("key", "value"))
    val got = zc.extractPathProperties(r).collect()
      .map(row => (Option(row.getString(0)), row.getSeq[String](1).toList))
      .toSeq.sortBy(_.toString())

    val expected = rows.map { case (start, hops, end) =>
      val props = lookupE(start).toList ++
        hops.flatMap(h => lookupV(h.v).toList ++ lookupE(h.e).toList) ++
        lookupV(end).toList
      (Option(end), props)
    }.sortBy(_.toString())
    assert(got == expected)
  }
}
