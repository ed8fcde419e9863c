package graft.cli

import graft.core.{Graph, GraphLink, GraphNode}
import graft.graph.{D3Json, GraphOps}

/** CLI mirroring `python -m arelight.run.operations` (reference
  * arelight/run/operations.py:85-149): set algebra over two force-graph JSONs.
  *
  * Usage: runMain graft.cli.Operations --a A.json --b B.json \
  *          --operation UNION|INTERSECTION|DIFFERENCE --out DIR [--name N] [--weights y|n]
  */
object Operations {

  /** Minimal force-graph JSON reader for the reference layout (driver-sized). */
  private[cli] def parseGraph(json: String): Graph = {
    // tiny recursive-descent JSON parser: objects/arrays/strings/numbers only
    val s = json; var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { ws(); require(s(i) == c, s"expected $c at $i"); i += 1 }
    def str(): String = {
      ws(); expect('"'); val b = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => b += '\n'; case 't' => b += '\t'; case 'r' => b += '\r'
            case 'b' => b += '\b'; case 'f' => b += '\f'
            case 'u' => b += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c   => b += c
          }
        } else b += s(i)
        i += 1
      }
      i += 1; b.toString
    }
    def num(): Double = {
      ws(); val start = i
      while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
      s.substring(start, i).toDouble
    }
    def value(): Any = {
      ws()
      s(i) match {
        case '{' => obj(); case '[' => arr(); case '"' => str()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _   => num()
      }
    }
    def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (s(i) == '}') { i += 1; Map.empty }
      else {
        val b = Map.newBuilder[String, Any]
        var done = false
        while (!done) {
          val k = str(); expect(':'); b += (k -> value()); ws()
          if (s(i) == ',') i += 1 else { expect('}'); done = true }
        }
        b.result()
      }
    }
    def arr(): Vector[Any] = {
      expect('['); ws()
      if (s(i) == ']') { i += 1; Vector.empty }
      else {
        val b = Vector.newBuilder[Any]
        var done = false
        while (!done) {
          b += value(); ws()
          if (s(i) == ',') i += 1 else { expect(']'); done = true }
        }
        b.result()
      }
    }
    val root = obj()
    def d(a: Any): Double = a match { case x: Double => x; case x => x.toString.toDouble }
    Graph(
      basis = root.getOrElse("basis", Vector.empty).asInstanceOf[Vector[Any]].map(_.toString),
      equation = root.getOrElse("equation", "").toString,
      nodes = root.getOrElse("nodes", Vector.empty).asInstanceOf[Vector[Any]].map { n =>
        val m = n.asInstanceOf[Map[String, Any]]
        GraphNode(m("id").toString, d(m("c")))
      },
      links = root.getOrElse("links", Vector.empty).asInstanceOf[Vector[Any]].map { l =>
        val m = l.asInstanceOf[Map[String, Any]]
        GraphLink(m("source").toString, m("target").toString, d(m("c")), m("sent").toString)
      })
  }

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    def read(p: String) = parseGraph(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
    val a = read(opts("--a"))
    val b = read(opts("--b"))
    val op = opts.getOrElse("--operation", GraphOps.Union)
    val weights = opts.getOrElse("--weights", "y") == "y"
    val out = opts.getOrElse("--out", sys.error("--out required"))
    val name = opts.getOrElse("--name", op.toLowerCase)
    val g = GraphOps(a, b, op, weights)
    D3Json.save(g, out, name, intLinkC = !weights, intNodeC = !weights)
    graft.graph.Viewer.save(out, name) // openable artifact: <out>/index.html
    println(s"""{"operation":"$op","nodes":${g.nodes.size},"links":${g.links.size},"out":"$out"}""")
  }
}
