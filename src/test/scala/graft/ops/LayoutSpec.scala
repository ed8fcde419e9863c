package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class LayoutSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("zValue: hand-computed interleave, masking, and bucket extraction") {
    // x=3 (0b11) on even bits, y=1 (0b01) on odd bits, 2 bits each:
    // b0: x->1<<0, y->1<<1; b1: x->1<<2, y->0  => 1+2+4 = 7
    val row = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .head().getLong(0)
    assert(row == 7L)
    // masking: values wrap at 2^bits — (3 + 4, 1 + 4) with bits=2 is the same cell
    val wrapped = Seq((7L, 5L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .head().getLong(0)
    assert(wrapped == 7L)
    val bucket = Seq((63L, 63L)).toDF("x", "y")
      .select(Layout.zBucket(Layout.zValue(Seq(col("x"), col("y")), 6), 2, 6, 16).as("b"))
      .head().getLong(0)
    assert(bucket == 15L) // max corner lands in the last of 16 buckets
  }

  test("z-ordered layout prunes a y-band query that an x-sorted layout cannot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // 64x64 grid of (x, y) points
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))

    Layout.writeZordered(grid, s"$dir/zorder", Seq("x", "y"), bits = 6, partitions = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/xsort")

    // per-file y bounds — what parquet footer stats / Iceberg manifests carry
    def filesTouchedByYBand(path: String): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("y").as("ymin"), max("y").as("ymax"))
      (stats.filter(col("ymin") <= 11 && col("ymax") >= 8).count(), stats.count())
    }
    val (zTouched, zTotal) = filesTouchedByYBand(s"$dir/zorder")
    val (xTouched, xTotal) = filesTouchedByYBand(s"$dir/xsort")
    assert(zTotal == 16 && xTotal == 16)
    // x-sorted files each span all y values -> the y-band touches every file;
    // z-ordered files cover small (x, y) boxes -> most files are pruned
    assert(xTouched == 16, s"x-sorted layout unexpectedly pruned: $xTouched")
    assert(zTouched <= 8, s"z-order should prune at least half the files, touched $zTouched")

    // layout changes bytes on disk, never rows: content is intact
    val back = spark.read.parquet(s"$dir/zorder")
    assert(back.count() == 64L * 64L)
    assert(back.distinct().count() == 64L * 64L)
  }
}
