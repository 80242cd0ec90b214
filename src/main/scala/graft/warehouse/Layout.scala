package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout maintenance: small-file compaction and Z-order
  * clustering. Neither changes query results — both change how much a
  * query READS, which at 100 TB is the difference between a scan and
  * a lookup.
  */
object Layout {

  /** Compact a parquet directory to ~`targetBytes` files. Streaming
    * ingest and partition-scoped upserts accrete small files; each one
    * costs a task + open + footer parse, so a million-file table
    * spends longer scheduling than scanning. File count derives from
    * the ACTUAL byte size (a bounded filesystem listing, no data
    * read); `coalesce` merges without a shuffle; the swap reuses
    * [[Merge.rewriteTable]]'s crash-recoverable two-rename.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new Path(path)).getLength
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    Merge.rewriteTable(spark, spark.read.parquet(path).coalesce(nFiles), path)
  }

  /** Z-value: bit-interleave of `cols`, each min-max scaled to `bits`
    * bits (range scalars come from one bounded agg). Sorting by this
    * value clusters rows so every file is tight in EVERY dimension —
    * a 2-D range predicate then prunes on both columns' min/max file
    * stats, where a linear sort is tight in its leading column only.
    * Pure Column arithmetic (shift/and/or), codegen all the way.
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 12): Column = {
    require(cols.nonEmpty && bits * cols.size <= 60, "z-value must fit a long")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"mn$i"), max(col(c)).cast("double").as(s"mx$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val maxCell = (1L << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      val mn = stats.getDouble(2 * i)
      val mx = stats.getDouble(2 * i + 1)
      val span = math.max(mx - mn, Double.MinPositiveValue)
      least(lit(maxCell), floor((col(c).cast("double") - mn) / span * maxCell)).cast("long")
    }
    (0 until bits).flatMap { b =>
      scaled.zipWithIndex.map { case (s, i) =>
        shiftleft(shiftright(s, b).bitwiseAND(1L), b * cols.size + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `path` clustered by the z-order of `cols`: global sort on
    * the z-value (range partitioner → balanced files), stats-tight
    * files on every clustered column.
    */
  def zorderWrite(spark: SparkSession, df: DataFrame, path: String,
      cols: Seq[String], nFiles: Int, bits: Int = 12): Unit = {
    val z = zValue(df, cols, bits)
    Merge.rewriteTable(spark,
      df.withColumn("__z", z).repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions("__z").drop("__z"),
      path)
  }
}
