package graft.link

import org.scalatest.funsuite.AnyFunSuite

class LinkerLshSpec extends AnyFunSuite {

  test("LSH linking groups near-duplicate surface forms, separates distinct entities") {
    val values = Seq(
      "Barack Obama", "Barak Obama", "barack  obama",
      "European Union", "Europan Union",
      "France", "Germany")
    val groups = Linker.lshGroups(values, jaccardThreshold = 0.55)
    def g(v: String) = groups(graft.text.TextOps.canonicalKey(v))
    assert(g("Barack Obama") == g("Barak Obama"))
    assert(g("European Union") == g("Europan Union"))
    assert(g("France") != g("Germany"))
    assert(g("France") != g("Barack Obama"))
    assert(g("European Union") != g("Barack Obama"))
  }

  test("LSH linking is deterministic and order-insensitive") {
    val values = Seq("alpha corp", "alpha corp.", "beta fund", "gamma", "alpha korp")
    val a = Linker.lshGroups(values)
    val b = Linker.lshGroups(values.reverse)
    assert(a == b)
  }

  test("exact duplicates always share a group regardless of threshold") {
    val groups = Linker.lshGroups(Seq("x y z", "X  Y  Z", "other"), jaccardThreshold = 1.0)
    assert(groups(graft.text.TextOps.canonicalKey("x y z")) ==
      groups(graft.text.TextOps.canonicalKey("X  Y  Z")))
  }
}
