package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** CentroidStore lifecycle on constant blobs (every blob member identical, so
  * every sum/mean is hand-computable): init writes the virtual prior + seed
  * sums, ingest folds a batch under the derived centroids exactly once, the
  * derived centroid is floor(total/cnt), and a crashed swap recovers. */
class CentroidStoreSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val dim = 8
  // blob c: 10 identical points of value 10c+1 per coord -> quantized 10000c+1000
  private def blob(c: Int, n: Int = 10, base: Long = 0L) =
    (0 until n).map(j => (base + c * 10 + j, Seq.fill(dim)((10 * c + 1).toDouble)))
  private def seedDf = (blob(0) ++ blob(1) ++ blob(2)).toDF("vec_id", "embedding")

  test("init + ingest: exact sums, derived centroids, replay no-op, crash recovery") {
    val store = java.nio.file.Files.createTempDirectory("graft-cstore").toString + "/cs"
    CentroidStore.init(seedDf, col("vec_id"), col("embedding"), store,
      CentroidStore.Params(k = 3, dim = dim, scale = 1000), iters = 2)

    // constant blobs train to exactly the blob value; prior(1) + seed(10)
    // leave the derived centroid unchanged: floor(11q/11) = q
    val c0 = CentroidStore.centroids(spark, store)
    val cell0 = CentroidStore.assign(Seq((99L, Seq.fill(dim)(1.0))).toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), store).head().getLong(1).toInt
    assert(c0(cell0).forall(_ == 1000L))

    // ingest 5 identical points of value 3 -> cell0; new sum 11*1000 + 5*3000
    val batch = (0 until 5).map(j => (100L + j, Seq.fill(dim)(3.0))).toDF("vec_id", "embedding")
    assert(CentroidStore.ingest(batch, col("vec_id"), col("embedding"), store, "b1"))
    assert(!CentroidStore.ingest(batch, col("vec_id"), col("embedding"), store, "b1")) // replay
    val c1 = CentroidStore.centroids(spark, store)
    assert(c1(cell0).forall(_ == 26000L / 16L), c1(cell0).toSeq.take(2))
    // other cells untouched
    assert(c1.indices.filter(_ != cell0).forall(i => c1(i).sameElements(c0(i))))
    // counts: cell0 has prior 1 + 10 seed + 5 batch
    val cnts = CentroidStore.state(spark, store)
      .filter(col("pos") === 0).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(cnts(cell0.toLong) == 16L && cnts.values.sum == 38L)

    // crash between the two renames: live dir missing, bak present -> recovered
    val fsys = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fsys.rename(new org.apache.hadoop.fs.Path(s"$store/state"),
      new org.apache.hadoop.fs.Path(s"$store/state.merge-bak")))
    assert(CentroidStore.mergedBatches(spark, store) == Set("init", "b1"))
    assert(CentroidStore.centroids(spark, store)(cell0).head == 26000L / 16L)

    // params are pinned; double init refuses
    assert(CentroidStore.params(spark, store) == CentroidStore.Params(3, dim, 1000))
    intercept[IllegalArgumentException](
      CentroidStore.init(seedDf, col("vec_id"), col("embedding"), store,
        CentroidStore.Params(k = 3, dim = dim, scale = 1000)))
  }
}
