package graft

import org.apache.spark.sql.functions._
import graft.warehouse.Layout

/** Compaction and Z-order clustering: results unchanged, reads shrink. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString + "/t"

  test("compact merges small files without changing content") {
    val dir = tmp("compact")
    val df = (1 to 5000).map(i => (i.toLong, s"row-$i")).toDF("id", "v")
    df.repartition(20).write.parquet(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    def nParquet = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(nParquet === 20)
    Layout.compact(spark, dir) // 5k rows ≪ 128 MB → one file
    assert(nParquet === 1)
    val back = spark.read.parquet(dir)
    assert(back.count() === 5000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  // files whose [ymn, ymx] stats-range overlaps the predicate — what
  // file-level min/max pruning would have to read for a y-only filter
  private def filesTouchedByY(dir: String, lo: Long, hi: Long): (Int, Int) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.toString).filter(_.endsWith(".parquet"))
    val touched = files.count { f =>
      val r = spark.read.parquet(f).agg(min("y"), max("y")).head()
      r.getLong(1) >= lo && r.getLong(0) <= hi
    }
    (touched, files.length)
  }

  test("z-order prunes on the non-leading column; a linear sort cannot") {
    // 64×64 uniform grid in 16 files. Linear sort leads with x, so
    // every file spans ~all of y — a y-only predicate reads ALL files.
    // Z-order tiles the plane — the same predicate's y-range overlaps
    // only the tile rows it crosses.
    val n = 64
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val zDir = tmp("zorder")
    val linDir = tmp("linear")
    Layout.zorderWrite(spark, grid, zDir, Seq("x", "y"), nFiles = 16)
    grid.repartitionByRange(16, col("x"), col("y")).sortWithinPartitions("x", "y")
      .write.parquet(linDir)
    val (zTouched, zTotal) = filesTouchedByY(zDir, 16, 23)     // 1/8 of y space
    val (linTouched, linTotal) = filesTouchedByY(linDir, 16, 23)
    assert(linTouched === linTotal, "x-led linear sort should leave y unprunable")
    assert(zTouched * 2 <= zTotal,
      s"z-order read $zTouched/$zTotal files for a y-slice; linear read $linTouched/$linTotal")
    // content preserved
    val back = spark.read.parquet(zDir)
    assert(back.count() === n.toLong * n)
    assert(back.exceptAll(grid).isEmpty && grid.exceptAll(back).isEmpty)
  }

  test("z-value interleaves bits deterministically") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L)).toDF("x", "y")
    // bits=2, range [0,3]: x=1,y=0 → x bits at even positions
    val z = df.select(col("x"), col("y"), Layout.zValue(df, Seq("x", "y"), bits = 2).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(z((0L, 0L)) === 0L)
    assert(z((3L, 3L)) === 15L)       // all four bits set
    assert(z((1L, 0L)) + z((0L, 1L)) === 3L) // bit-disjoint neighbors
  }
}
