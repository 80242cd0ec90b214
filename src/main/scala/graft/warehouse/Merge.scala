package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

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
    val dst = new Path(path)
    val oldP = new Path(old)
    fs.delete(oldP, true)
    if (fs.exists(dst)) fs.rename(dst, oldP)
    fs.rename(new Path(tmp), dst)
    fs.delete(oldP, true)
  }

  // ---- partition-scoped (bucketed) upsert ---------------------------------

  /** Derived partition column for [[upsertBucketed]] tables. */
  val BucketCol = "__bucket"

  /** Attach the key-hash bucket a row's key maps to. The bucket is a
    * pure function of the key columns, so the current and any updated
    * version of a key always land in the same partition directory —
    * the property that makes partition-scoped rewrite correct.
    */
  def withBucket(df: DataFrame, keys: Seq[String], nBuckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(xxhash64(keys.map(col): _*), lit(nBuckets)).cast("int"))

  /** Upsert that rewrites only touched partitions: the table lives
    * partitioned by `__bucket = hash(keys) mod nBuckets`; a merge reads
    * and rewrites just the bucket dirs the incoming keys hash to
    * (partition pruning on the scan, per-dir swap on the write), so the
    * cost is O(|incoming| × table/nBuckets), not O(table) — every other
    * partition's files are left byte-identical. A table not yet in the
    * bucketed layout is migrated once (one full rewrite).
    */
  def upsertBucketed(spark: SparkSession, tablePath: String, incoming0: DataFrame,
      keys: Seq[String], nBuckets: Int = 64): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)
    val incoming = withBucket(incoming0, keys, nBuckets)
    if (!fs.exists(new Path(tablePath))) {
      incoming.write.partitionBy(BucketCol).parquet(tablePath)
      return
    }
    if (!spark.read.parquet(tablePath).columns.contains(BucketCol))
      rewriteTable(spark, withBucket(spark.read.parquet(tablePath), keys, nBuckets),
        tablePath, Seq(BucketCol))
    val target = spark.read.parquet(tablePath)
    // bucket values are bounded by nBuckets — a scalar-sized collect
    val touched = incoming.select(BucketCol).distinct().collect().map(_.getInt(0)).toSeq
    val affected = target.filter(col(BucketCol).isin(touched: _*))
    val merged = upsert(affected, incoming, keys)
    // stage the merged buckets, then swap each dir in; displaced dirs go
    // to a sibling trash dir (NOT `<dir>.old` inside the table, which
    // partition discovery would misread as a partition value)
    val tmp = new Path(tablePath + ".tmppart")
    merged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(tmp.toString)
    val trash = new Path(tablePath + ".oldpart")
    fs.delete(trash, true)
    fs.mkdirs(trash)
    for (st <- fs.listStatus(tmp) if st.isDirectory) {
      val dst = new Path(tablePath, st.getPath.getName)
      if (fs.exists(dst)) fs.rename(dst, new Path(trash, st.getPath.getName))
      fs.rename(st.getPath, dst)
    }
    fs.delete(tmp, true)
    fs.delete(trash, true)
  }
}
