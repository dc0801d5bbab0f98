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
      // ghost edge ids (unchecked E.Specific) carry no endpoints — hops skip
      case VertexQuery.Out(eq)        => evalE(eq).flatMap(e => edges.get(e).map(_._2))
      case VertexQuery.In(eq)         => evalE(eq).flatMap(e => edges.get(e).map(_._1))
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
      // reference parity: listed edge ids are NOT existence-checked
      // (kv_graph_store.rs:229-233) — ghosts survive in the edge result
      case EdgeQuery.Specific(ids)    => ids.toSet
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

    /** Context = (start edge, path of (vertex, edge) hops) — the traversal
      * state the compiler threads per row (ql.rs:269-334). The model keeps
      * the SET of derivable contexts per result id; the compiled engine
      * keeps all rows and surfaces ONE per id at assembly (`first`), so the
      * check is membership + id-set equality, never a specific pick. */
    type Ctx = (Option[String], List[(String, String)])
    private val freshCtx: Set[Ctx] = Set((None, Nil))

    private def mergeCtx(a: Map[String, Set[Ctx]], b: Map[String, Set[Ctx]]) =
      (a.keySet ++ b.keySet).map(k =>
        k -> (a.getOrElse(k, Set.empty) ++ b.getOrElse(k, Set.empty))).toMap

    def ctxV(q: VertexQuery): Map[String, Set[Ctx]] = q match {
      case VertexQuery.All           => nodes.keySet.map(_ -> freshCtx).toMap
      case VertexQuery.Specific(ids) => ids.map(_ -> freshCtx).toMap
      case VertexQuery.Property(pq)  =>
        val h = evalP(pq)
        nodes.collect { case (n, p) if h(p) => n -> freshCtx }.toMap
      // entering a vertex does not extend the path (ql.rs:333-352);
      // ghost edges have no endpoints and drop out of the hop
      case VertexQuery.Out(eq) =>
        ctxE(eq).toSeq.flatMap { case (e, cs) => edges.get(e).map(t => Map(t._2 -> cs)) }
          .foldLeft(Map.empty[String, Set[Ctx]])(mergeCtx)
      case VertexQuery.In(eq) =>
        ctxE(eq).toSeq.flatMap { case (e, cs) => edges.get(e).map(t => Map(t._1 -> cs)) }
          .foldLeft(Map.empty[String, Set[Ctx]])(mergeCtx)
      case VertexQuery.Union(a, b)     => mergeCtx(ctxV(a), ctxV(b))
      case VertexQuery.Intersect(a, b) => // keeps LEFT contexts
        val keep = ctxV(b).keySet; ctxV(a).filter(kv => keep(kv._1))
      case VertexQuery.Substract(a, b) => ctxV(a) -- ctxV(b).keySet
      case VertexQuery.DisjunctiveUnion(a, b) =>
        val (x, y) = (ctxV(a), ctxV(b))
        mergeCtx(x -- y.keySet, y -- x.keySet)
      case VertexQuery.Store(s)      => ctxV(s) // token only; path untouched
      case VertexQuery.Filter(_, _)  => sys.error("not generated")
    }

    def ctxE(q: EdgeQuery): Map[String, Set[Ctx]] = q match {
      // a chain STARTING at an edge records it in `start` (ql.rs:326-334)
      case EdgeQuery.All           => edges.keySet.map(e => e -> Set((Some(e): Option[String], List.empty[(String, String)]))).toMap
      case EdgeQuery.Specific(ids) => ids.map(e => e -> Set((Some(e): Option[String], List.empty[(String, String)]))).toMap
      case EdgeQuery.Property(pq)  =>
        val h = evalP(pq)
        edges.collect { case (e, (_, _, p)) if h(p) =>
          e -> Set((Some(e): Option[String], List.empty[(String, String)])) }.toMap
      // entering an edge appends (currentVertex, edge) (ql.rs:281-302)
      case EdgeQuery.Out(vq) =>
        ctxV(vq).toSeq.flatMap { case (v, cs) =>
          edges.collect { case (e, (s, _, _)) if s == v =>
            Map(e -> cs.map { case (st, p) => (st, p :+ (v -> e)) }) }
        }.foldLeft(Map.empty[String, Set[Ctx]])(mergeCtx)
      case EdgeQuery.In(vq) =>
        ctxV(vq).toSeq.flatMap { case (v, cs) =>
          edges.collect { case (e, (_, d, _)) if d == v =>
            Map(e -> cs.map { case (st, p) => (st, p :+ (v -> e)) }) }
        }.foldLeft(Map.empty[String, Set[Ctx]])(mergeCtx)
      case EdgeQuery.Union(a, b)     => mergeCtx(ctxE(a), ctxE(b))
      case EdgeQuery.Intersect(a, b) =>
        val keep = ctxE(b).keySet; ctxE(a).filter(kv => keep(kv._1))
      case EdgeQuery.Substract(a, b) => ctxE(a) -- ctxE(b).keySet
      case EdgeQuery.DisjunctiveUnion(a, b) =>
        val (x, y) = (ctxE(a), ctxE(b))
        mergeCtx(x -- y.keySet, y -- x.keySet)
      case EdgeQuery.Store(s)      => ctxE(s)
      case EdgeQuery.Filter(_, _)  => sys.error("not generated")
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

  test("traversal contexts (start/path) agree with the model on random ASTs") {
    val (batch, model) = buildGraph(6,
      Seq((0, 1, 0), (1, 2, 1), (2, 3, 0), (3, 4, 1), (4, 5, 0), (5, 0, 1),
        (0, 3, 0), (1, 4, 1), (2, 2, 0)))
    val zc = new ZoeCompiler(batch.toStore(spark).persistAll())
    edgeIdPool = model.edges.keys.take(3).toSeq :+ "GHOST"
    def pathOf(r: org.apache.spark.sql.Row): List[(String, String)] =
      if (r.isNullAt(1)) Nil
      else r.getSeq[org.apache.spark.sql.Row](1)
        .map(h => (h.getAs[String]("v"), h.getAs[String]("e"))).toList

    (1 to 10).foreach { i =>
      val q = genV(3).pureApply(Gen.Parameters.default, Seed(3000L + i))
      val m = model.ctxV(q)
      val rows = zc.run(q).paths.collect()
        .map(r => (Option(r.getString(0)), pathOf(r), r.getString(2)))
      // one assembled row per result id; its context must be DERIVABLE
      // (the engine keeps all colliding rows and surfaces one — `first`)
      assert(rows.map(_._3).toSet == m.keySet, s"\nseed $i id set: $q")
      rows.foreach { case (start, path, end) =>
        assert(m(end).contains((start, path)),
          s"\nseed $i query: $q\nend $end ctx ($start, $path) not in ${m(end)}")
      }
    }
    (101 to 110).foreach { i =>
      val q = genE(3).pureApply(Gen.Parameters.default, Seed(4000L + i))
      val m = model.ctxE(q)
      // edge-result paths drop the edge id (end = null): one row per id,
      // each context derivable for SOME result edge
      val rows = zc.run(q).paths.collect().map(r => (Option(r.getString(0)), pathOf(r)))
      assert(rows.length == m.size, s"\nseed $i row count: $q")
      rows.foreach { ctx =>
        assert(m.values.exists(_.contains(ctx)),
          s"\nseed $i query: $q\nctx $ctx not derivable")
      }
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
