package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** node2vec second-order walks verified against an independent pure-Scala
  * implementation of the same contract on a 60-node graph, plus structural
  * sanity (every hop is a real edge) and partition invariance. */
class Node2vecSpec extends AnyFunSuite with SparkTestSession {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def hashPick(s: String, mod: Long): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16) % mod

  private val n = 60
  private def id(i: Int): String = s"v$i"
  private val adjRef: Map[String, Set[String]] = (0 until n).map { i =>
    id(i) -> Set((i * 5 + 2) % n, (i * 11 + 7) % n, (i * 17 + 1) % n).map(id)
  }.toMap

  private val (mp, ms, mq) = (1L, 2L, 4L)
  private val seed = "n2v"

  /** Independent reference walk — same contract, different code. */
  private def refWalk(v: String, len: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer(v)
    var prev = v
    val nbrs1 = adjRef(v).toSeq.sorted
    if (nbrs1.isEmpty) return out.toSeq
    var cur = nbrs1(hashPick(s"$v|1|$seed", nbrs1.size).toInt)
    out += cur
    for (t <- 2 to len) {
      val nbrs = adjRef(cur).toSeq.sorted
      if (nbrs.nonEmpty && out.size == t) {
        val mults = nbrs.map { nb =>
          if (nb == prev) mp else if (adjRef(prev).contains(nb)) ms else mq
        }
        val total = mults.sum
        val p = hashPick(s"$prev|$cur|$t|$seed", total)
        var cume = 0L
        var next: Option[String] = None
        nbrs.zip(mults).foreach { case (nb, m) =>
          if (next.isEmpty && p >= cume && p < cume + m) next = Some(nb)
          cume += m
        }
        prev = cur
        cur = next.get
        out += cur
      }
    }
    out.toSeq
  }

  private def edgeDf: DataFrame = {
    import spark.implicits._
    (0 until n).flatMap(i => adjRef(id(i)).map(j => (id(i), j, 1.0)))
      .toDF("source", "target", "c")
  }

  private def collectWalks(df: DataFrame): Map[(String, Long), String] =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap

  test("node2vecWalks == independent second-order reference on all 60 starts") {
    val got = collectWalks(GraphOps.node2vecWalks(edgeDf, walkLen = 4,
      returnMult = 1, sharedMult = 2, awayMult = 4, seed = seed))
    val want = (0 until n).flatMap { i =>
      refWalk(id(i), 4).zipWithIndex.map { case (node, step) =>
        (id(i), step.toLong) -> node
      }
    }.toMap
    assert(got == want)
  }

  test("every consecutive hop is a real directed edge; walks are full length") {
    val walks = GraphOps.node2vecWalks(edgeDf, walkLen = 3, seed = "x")
    val byWalk = walks.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byWalk.size == n)
    byWalk.values.foreach { path =>
      assert(path.length == 4) // every node here has out-degree >= 1
      path.sliding(2).foreach { case Seq(a, b) =>
        assert(adjRef(a).contains(b), s"hop $a -> $b is not an edge")
      }
    }
  }

  test("partition-invariant") {
    val a = collectWalks(GraphOps.node2vecWalks(edgeDf, walkLen = 4, seed = seed))
    val b = collectWalks(GraphOps.node2vecWalks(edgeDf.repartition(17), walkLen = 4, seed = seed))
    assert(a == b)
  }
}
