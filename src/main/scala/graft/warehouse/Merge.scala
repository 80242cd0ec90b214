package graft.warehouse

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Key-based upsert / incremental-load semantics (SURVEY.md §2 A7, C5).
  *
  * The reference leans on Postgres `INSERT … ON CONFLICT DO UPDATE`
  * (`scripts/etl.py:122-126`) and dbt's `is_incremental()` NOT-EXISTS
  * insert (`dim_patients.sql:20-26`). Parquet has no MERGE, so both
  * become join-rewrites:
  *
  *   upsert     = target ▷ incoming (anti on keys) ∪ incoming
  *   insertOnly = target ∪ (incoming ▷ target)
  *
  * Both are idempotent (property-tested) and scale as one shuffled
  * join on the natural key — or zero shuffles when both sides are
  * bucketed on the key.
  */
object Merge {

  /** ON CONFLICT DO UPDATE: incoming wins on key collision. */
  def upsert(target: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    target.join(incoming.select(keys.head, keys.tail: _*), keys, "left_anti")
      .unionByName(incoming)

  /** dbt is_incremental(): only new keys are appended; existing rows
    * are never modified.
    */
  def insertOnly(target: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(
      incoming.join(target.select(keys.head, keys.tail: _*), keys, "left_anti"))

  /** Table rewrite via a two-rename swap: write tmp, move the live
    * table aside, move tmp into place, drop the old copy. A crash
    * between the renames leaves the data recoverable under `.old` —
    * the previous delete-then-rename order had a window where the only
    * copy was `.tmp`. True atomicity needs a pointer swap (metastore /
    * table-format commit), which is the production path at scale; this
    * is the best a bare filesystem offers. At scale also prefer
    * rewriting only the partitions containing touched keys.
    */
  def rewriteTable(spark: SparkSession, df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val tmp = path + ".tmp"
    val old = path + ".old"
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val oldP = new org.apache.hadoop.fs.Path(old)
    fs.delete(oldP, true)
    if (fs.exists(dst)) fs.rename(dst, oldP)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    fs.delete(oldP, true)
  }
}
