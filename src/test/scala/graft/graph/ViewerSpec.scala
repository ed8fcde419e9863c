package graft.graph

import org.scalatest.funsuite.AnyFunSuite

class ViewerSpec extends AnyFunSuite {

  test("index.html references the graph's force and radial JSON by name") {
    val h = Viewer.html("mygraph")
    assert(h.contains("\"mygraph\""))
    // the page fetches layout + "/" + NAME + ".json" relative to itself —
    // i.e. force/mygraph.json and radial/mygraph.json (ui_web.py folder contract)
    assert(h.contains("fetch(layout + \"/\" + NAME + \".json\")"))
    assert(h.contains("show('force')") && h.contains("show('radial')"))
    assert(h.contains("<!doctype html>"))
    // offline artifact: no external script/CDN references (the only URL is
    // the SVG xmlns constant passed to createElementNS)
    assert(!h.contains("https://") && !h.contains("<script src"))
    assert(h.linesIterator.filter(_.contains("http://")).forall(_.contains("w3.org/2000/svg")))
  }

  test("save writes <out>/index.html") {
    val dir = java.nio.file.Files.createTempDirectory("viewer").toString
    val p = Viewer.save(dir, "demo")
    assert(p.getFileName.toString == "index.html")
    val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(body.contains("\"demo\""))
  }

  test("name with quotes is escaped into valid JS") {
    val h = Viewer.html("a\"b")
    assert(h.contains("const NAME = \"a\\\"b\";"))
  }

  test("hostile names cannot break out of the script block or the title") {
    val h = Viewer.html("""x</script><script>alert(1)</script>\"; evil()//""")
    // no literal </script> (or any angle bracket from the name) survives
    // inside the generated page's inline script
    assert(!h.contains("</script><script>"))
    assert(h.contains("\\u003c/script\\u003e"))
    // backslashes are doubled so the JS string literal stays closed
    assert(h.contains("\\\\\\\""))
    // the HTML title uses entity escaping, not raw angle brackets
    assert(h.contains("graft graph — x&lt;/script&gt;"))
  }

  test("backslash-only name yields a valid JS literal") {
    val h = Viewer.html("""a\b""")
    assert(h.contains("const NAME = \"a\\\\b\";"))
  }
}
