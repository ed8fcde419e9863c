package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Rank store: exact continuation across invocations, crash-mid-swap
  * recovery, and cold start == plain PageRank. */
class RankStoreSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def edgesDf = Seq(
    ("a", "b", "pos", 2.0), ("b", "c", "pos", 1.0), ("c", "a", "neg", 3.0),
    ("a", "c", "pos", 1.0)).toDF("source", "target", "sent", "c")

  private def collectRanks(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def tmp() = java.nio.file.Files.createTempDirectory("rankstore").toString

  test("advance twice equals one longer run, and the store persists between calls") {
    val dir = tmp()
    RankStore.advance(edgesDf, dir, iters = 2)
    val second = collectRanks(RankStore.advance(edgesDf, dir, iters = 2))
    assert(second == collectRanks(GraphOps.pageRank(edgesDf, iters = 4)))
    // read-back matches what advance returned
    assert(collectRanks(RankStore.read(spark, dir).get) == second)
  }

  test("cold start is the uniform-start PageRank") {
    val dir = tmp()
    assert(collectRanks(RankStore.advance(edgesDf, dir, iters = 3)) ==
      collectRanks(GraphOps.pageRank(edgesDf, iters = 3)))
  }

  test("crash mid-swap recovers the previous snapshot on the next entry") {
    val dir = tmp()
    RankStore.advance(edgesDf, dir, iters = 2)
    val before = collectRanks(RankStore.read(spark, dir).get)
    // simulate a crash between the two renames: ranks moved to .bak, no new ranks
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/ranks"),
      new org.apache.hadoop.fs.Path(s"$dir/ranks.bak")))
    assert(collectRanks(RankStore.read(spark, dir).get) == before) // recovered
    // and advancing from the recovered state still continues exactly
    val next = collectRanks(RankStore.advance(edgesDf, dir, iters = 1))
    assert(next == collectRanks(GraphOps.pageRank(edgesDf, iters = 3)))
  }
}
