package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.graph.GraphBuilder.Relation

class GraphSpec extends AnyFunSuite {

  private val entityMap = Map("usa" -> "GPE", "bob" -> "PERSON", "x.y." -> "ORG")

  test("cleanValue: trailing dots stripped then dots masked (P16)") {
    assert(GraphBuilder.cleanValue("x.y.") == "x·y")
    assert(GraphBuilder.cleanValue("usa") == "usa")
    assert(GraphBuilder.cleanValue("...") == "")
  }

  test("nodeKey composition with UNKNOWN fallback (P17)") {
    assert(GraphBuilder.nodeKey(Some("GPE"), "usa") == "GPE.usa")
    assert(GraphBuilder.nodeKey(None, "who") == "UNKNOWN.who")
  }

  test("buildLocal: counts, min_links, degree normalization (relations_graph_builder.py)") {
    val rels = Seq(
      Relation("usa", "bob", "neg"), Relation("usa", "bob", "neg"),
      Relation("bob", "usa", "pos"), Relation("usa", "x.y.", "neu"))
    val g = GraphBuilder.buildLocal("g", rels, entityMap, minLinks = 2, weights = true)
    assert(g.links == Seq(GraphLink("GPE.usa", "PERSON.bob", 2.0, "neg")))
    assert(g.nodes.toSet == Set(GraphNode("GPE.usa", 1.0), GraphNode("PERSON.bob", 1.0)))
    assert(g.basis == Seq("g") && g.equation == "[g]")

    val g1 = GraphBuilder.buildLocal("g", rels, entityMap, minLinks = 1, weights = true)
    assert(g1.links.size == 3)
    // usa has degree 3 (2 surviving edges as source + 1 as target), bob 2, x.y 1
    val byId = g1.nodes.map(n => n.id -> n.c).toMap
    assert(byId("GPE.usa") == 1.0)
    assert(byId("PERSON.bob") == 2.0 / 3)
    assert(byId("ORG.x·y") == 1.0 / 3)
  }

  test("buildLocal weights=false: all c = 1") {
    val g = GraphBuilder.buildLocal("g",
      Seq(Relation("usa", "bob", "neg"), Relation("usa", "bob", "neg")), entityMap)
      .copy()
    val gw = GraphBuilder.buildLocal("g",
      Seq(Relation("usa", "bob", "neg"), Relation("usa", "bob", "neg")), entityMap, weights = false)
    assert(g.links.head.c == 2.0)
    assert(gw.links.head.c == 1.0 && gw.nodes.forall(_.c == 1.0))
  }

  private def graph(name: String, links: (String, String, String, Double)*): Graph = {
    val ls = links.map { case (s, t, sent, c) => GraphLink(s, t, c, sent) }
    Graph(Seq(name), s"[$name]", Seq.empty, ls)
  }

  test("UNION: weight sum then normalize; node weight = sum of incident c (U1/A4)") {
    val a = graph("a", ("s", "t", "pos", 2.0), ("s", "u", "neg", 1.0))
    val b = graph("b", ("s", "t", "pos", 2.0))
    val g = GraphOps(a, b, GraphOps.Union)
    val byKey = g.links.map(l => (l.source, l.target, l.sent) -> l.c).toMap
    assert(byKey(("s", "t", "pos")) == 1.0) // (2+2)/4
    assert(byKey(("s", "u", "neg")) == 0.25) // 1/4
    val nodeC = g.nodes.map(n => n.id -> n.c).toMap
    assert(nodeC("s") == 1.25 && nodeC("t") == 1.0 && nodeC("u") == 0.25)
    assert(g.equation == "([a])+([b])" && g.basis == Seq("a", "b"))
  }

  test("INTERSECTION: normalize-first then min then renormalize (U2)") {
    val a = graph("a", ("s", "t", "pos", 4.0), ("s", "u", "neg", 2.0))
    val b = graph("b", ("s", "t", "pos", 1.0), ("x", "y", "pos", 2.0))
    val g = GraphOps(a, b, GraphOps.Intersection)
    // normalized: a(s,t)=1.0, b(s,t)=0.5 -> min 0.5 -> renormalize -> 1.0
    assert(g.links == Seq(GraphLink("s", "t", 1.0, "pos")))
  }

  test("DIFFERENCE: non-commutative, keeps A-only and positive remainder (U3)") {
    val a = graph("a", ("s", "t", "pos", 4.0), ("s", "u", "neg", 2.0))
    val b = graph("b", ("s", "t", "pos", 1.0))
    val g = GraphOps(a, b, GraphOps.Difference)
    // norm a: (s,t)=1.0,(s,u)=0.5; norm b: (s,t)=1.0 -> remainder 0 dropped; (s,u)=0.5 -> 1.0
    assert(g.links == Seq(GraphLink("s", "u", 1.0, "neg")))
    val g2 = GraphOps(b, a, GraphOps.Difference)
    assert(g2.links.isEmpty || g2.links != g.links)
  }

  test("empty result yields the U5 sentinel") {
    val a = graph("a", ("s", "t", "pos", 1.0))
    val g = GraphOps(a, a, GraphOps.Difference)
    assert(g.nodes == Seq(GraphNode("GPE.EMPTY_GRAPH(no_similarity_OR_no_difference)", 1.0)))
    assert(g.links.isEmpty)
  }

  test("weights=false resets c before AND after (U4)") {
    val a = graph("a", ("s", "t", "pos", 5.0))
    val b = graph("b", ("s", "t", "pos", 3.0))
    val g = GraphOps(a, b, GraphOps.Union, weights = false)
    assert(g.links.head.c == 1.0 && g.nodes.forall(_.c == 1.0))
  }

  test("radial rollup groups links under target (A7, utils_graph.py:16-31)") {
    val g = Graph(Seq("g"), "[g]",
      Seq(GraphNode("a", 1.0), GraphNode("b", 0.5)),
      Seq(GraphLink("a", "b", 2.0, "pos"), GraphLink("b", "a", 1.0, "neg")))
    val radial = D3Json.toRadial(g)
    assert(radial.map(_.name) == Seq("a", "b"))
    assert(radial(0).imports == Seq(D3Json.RadialImport("b", 1.0, "neg")))
    assert(radial(1).imports == Seq(D3Json.RadialImport("a", 2.0, "pos")))
  }

  test("force JSON matches Python json.dump(indent=4, ensure_ascii=False) layout") {
    val g = Graph(Seq("g"), "[g]",
      Seq(GraphNode("GPE.сша", 1.0)), Seq(GraphLink("GPE.сша", "P.b", 2.0, "neg")))
    val json = D3Json.forceJson(g, intLinkC = true, intNodeC = false)
    val expected =
      """{
        |    "basis": [
        |        "g"
        |    ],
        |    "equation": "[g]",
        |    "nodes": [
        |        {
        |            "id": "GPE.сша",
        |            "c": 1.0
        |        }
        |    ],
        |    "links": [
        |        {
        |            "source": "GPE.сша",
        |            "target": "P.b",
        |            "c": 2,
        |            "sent": "neg"
        |        }
        |    ]
        |}""".stripMargin
    assert(json == expected)
  }
}
