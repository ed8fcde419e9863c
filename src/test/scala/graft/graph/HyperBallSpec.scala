package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperBall's defining invariant: after r rounds, node v's register rows are
  * EXACTLY the HLL registers of the exact BFS out-ball B(v, r) — verified
  * against an independent pure-Scala register implementation on a 150-node
  * graph, plus fixpoint idempotence and estimate accuracy (p=8 envelope). */
class HyperBallSpec extends AnyFunSuite with SparkTestSession {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Independent (register, rho) reference — NOT the Sketches column code. */
  private def regRho(key: String, p: Int): (Long, Long) = {
    val hex = md5hex(key)
    val n = p / 4
    val reg = java.lang.Long.parseLong(hex.substring(0, n), 16)
    val tail = hex.substring(n, n + 15)
    val stripped = tail.dropWhile(_ == '0')
    val rho =
      if (stripped.isEmpty) 61L
      else {
        val zeroNibbles = (tail.length - stripped.length) * 4L
        val nibbleZeros = stripped.head match {
          case '1'                   => 3L
          case '2' | '3'             => 2L
          case '4' | '5' | '6' | '7' => 1L
          case _                     => 0L
        }
        zeroNibbles + nibbleZeros + 1L
      }
    (reg, rho)
  }

  private def hllOf(members: Set[String], p: Int): Map[(Long), Long] =
    members.toSeq.map(regRho(_, p)).groupBy(_._1).map { case (r, xs) => r -> xs.map(_._2).max }

  private val n = 150
  private def id(i: Int): String = s"n$i"
  private val adjRef: Map[Int, Seq[Int]] =
    (0 until n).map(i => i -> Seq((i * 7 + 1) % n, (i * 13 + 3) % n)).toMap

  private def ball(v: Int, r: Int): Set[Int] = {
    var s = Set(v)
    for (_ <- 1 to r) s = s ++ s.flatMap(adjRef)
    s
  }

  private def edgeDf: DataFrame = {
    import spark.implicits._
    (0 until n).flatMap(i => adjRef(i).map(j => (id(i), id(j), 1.0)))
      .toDF("source", "target", "c")
  }

  private def got(df: DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("hyperBall registers == HLL of the exact BFS ball, 150-node graph (p=4, r=2)") {
    val regs = got(GraphOps.hyperBall(edgeDf, p = 4, rounds = 2))
    val want = (0 until n).flatMap { v =>
      hllOf(ball(v, 2).map(id), 4).map { case (reg, rho) => (id(v), reg) -> rho }
    }.toMap
    assert(regs == want)
  }

  test("round-0 state would be the singleton sketch; 1 round pulls direct successors only") {
    val regs = got(GraphOps.hyperBall(edgeDf, p = 8, rounds = 1))
    val want = (0 until n).flatMap { v =>
      hllOf(ball(v, 1).map(id), 8).map { case (reg, rho) => (id(v), reg) -> rho }
    }.toMap
    assert(regs == want)
  }

  test("register max-merge is a fixpoint: extra rounds past the diameter are a no-op") {
    import spark.implicits._
    // A->B->C chain, diameter 2: rounds=2 and rounds=5 agree
    val e = Seq(("A", "B", 1.0), ("B", "C", 1.0)).toDF("source", "target", "c")
    assert(got(GraphOps.hyperBall(e, p = 4, rounds = 2)) ==
      got(GraphOps.hyperBall(e, p = 4, rounds = 5)))
    // and the hand check: A's rows are the registers of {A,B,C}
    val a = got(GraphOps.hyperBall(e, p = 4, rounds = 2)).collect {
      case (("A", reg), rho) => reg -> rho
    }
    assert(a == hllOf(Set("A", "B", "C"), 4))
  }

  test("effective-diameter estimate agrees with the exact neighborhood function " +
      "where HLL sits in its near-exact linear-counting regime") {
    import spark.implicits._
    // hub -> 8 leaves: N jumps 9 -> 17 at r=1 and stays — the 90% mass line
    // falls strictly inside the jump, so the boundary is robust to HLL noise
    // (a fixture sitting exactly ON the 90% line would flip on estimator bias)
    val star = (0 until 8).map(i => ("HUB", s"leaf$i"))
      .toDF("source", "target").withColumn("sent", lit(0)).withColumn("c", lit(1.0))
    val exact = GraphOps.neighborhoodFunction(star, rounds = 3).collect()
      .find(_.getBoolean(3)).get.getLong(0)
    assert(exact == 1L)
    val est = GraphOps.effectiveDiameterEstimate(star, p = 8, maxRounds = 3)
    assert(est.count(_._3) == 1)
    assert(est.find(_._3).get._1.toLong == exact, s"estimate $est vs exact $exact")
    // N-hat is monotone in r
    assert(est.map(_._2) == est.map(_._2).sorted)
  }

  test("ball-size estimates land in the p=8 error envelope of the exact counts") {
    val sizes = GraphOps.hyperBallSizes(GraphOps.hyperBall(edgeDf, p = 8, rounds = 3), p = 8)
    assert(sizes.size == n)
    (0 until n).foreach { v =>
      val exact = ball(v, 3).size.toDouble
      val est = sizes(id(v))
      assert(math.abs(est - exact) / exact <= 0.20,
        s"node $v: est $est vs exact $exact")
    }
  }
}
