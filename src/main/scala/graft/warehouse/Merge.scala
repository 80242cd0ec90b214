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

  /** Sidecar recording the table's bucket count. nBuckets is a layout
    * invariant: rows live in `__bucket = hash(keys) mod N` dirs, so a
    * merge run with a different N would hash incoming keys into
    * different buckets and the anti-join would never see a key's
    * existing row — a silent duplicate-key corruption. The leading
    * underscore keeps parquet partition discovery from reading it.
    */
  private def bucketsMeta(tablePath: String) = new Path(tablePath, "_graft_nbuckets")

  private def writeBucketsMeta(fs: org.apache.hadoop.fs.FileSystem,
      tablePath: String, n: Int): Unit = {
    val out = fs.create(bucketsMeta(tablePath), true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The persisted bucket count of a bucketed table, if recorded. */
  def readBucketsMeta(fs: org.apache.hadoop.fs.FileSystem, tablePath: String): Option[Int] =
    if (!fs.exists(bucketsMeta(tablePath))) None
    else {
      val in = fs.open(bucketsMeta(tablePath))
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](64)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        Some(new String(buf.toByteArray, "UTF-8").trim.toInt)
      } finally in.close()
    }

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
    if (!fs.exists(new Path(tablePath))) {
      withBucket(incoming0, keys, nBuckets).write.partitionBy(BucketCol).parquet(tablePath)
      writeBucketsMeta(fs, tablePath, nBuckets)
      return
    }
    // the table's recorded N wins over the caller's argument — mixing
    // bucket counts silently corrupts the upsert (see bucketsMeta); a
    // pre-sidecar bucketed table records the caller's N on first touch
    // (written only when absent, so steady-state merges leave untouched
    // files byte-identical)
    val recorded = readBucketsMeta(fs, tablePath)
    val n = recorded.getOrElse(nBuckets)
    if (n != nBuckets)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"upsertBucketed($tablePath): table is bucketed with N=$n; ignoring caller nBuckets=$nBuckets")
    val incoming = withBucket(incoming0, keys, n)
    if (!spark.read.parquet(tablePath).columns.contains(BucketCol))
      rewriteTable(spark, withBucket(spark.read.parquet(tablePath), keys, n),
        tablePath, Seq(BucketCol))
    else if (recorded.isEmpty) {
      // pre-sidecar bucketed table: the dir layout is the only truth
      // about its N, and the caller's word is about to become the
      // recorded one. Two ways the claim can be a lie: (a) N smaller
      // than the layout's max bucket — provably wrong from dir names
      // alone (hash mod N can't have produced it); (b) N LARGER than
      // the table's true N (say 8 claimed on a true-4 table) — every
      // dir name is < 8, so only the data can expose it: recompute
      // hash(keys) mod N on a bounded sample and compare with the dir
      // each row actually lives in (≈half the rows mismatch when the
      // claim is wrong, so a few thousand rows make a false accept
      // vanishingly unlikely; a truthful claim mismatches zero rows).
      // Recording a lie would lock in exactly the silent duplicate-key
      // corruption the sidecar exists to prevent — re-bucket with the
      // caller's N instead of trusting it.
      val maxBucket = fs.listStatus(new Path(tablePath))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(BucketCol + "="))
        .flatMap(st => st.getPath.getName.stripPrefix(BucketCol + "=").toIntOption)
        .foldLeft(-1)(math.max)
      lazy val sampleMismatch = {
        val dirBucket = "__bucket_dir"
        val sample = spark.read.parquet(tablePath)
          .select((keys.map(col) :+ col(BucketCol).as(dirBucket)): _*)
          .limit(4096)
        !withBucket(sample, keys, n).filter(col(BucketCol) =!= col(dirBucket)).isEmpty
      }
      if (maxBucket >= n || sampleMismatch) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"upsertBucketed($tablePath): layout contradicts caller nBuckets=$n " +
            s"(maxBucket=$maxBucket, sampled hash(keys) mod $n ≠ dir) — re-bucketing with N=$n")
        rewriteTable(spark, withBucket(spark.read.parquet(tablePath).drop(BucketCol), keys, n),
          tablePath, Seq(BucketCol))
      }
    }
    if (recorded.isEmpty) writeBucketsMeta(fs, tablePath, n)
    val target = spark.read.parquet(tablePath)
    // bucket values are bounded by nBuckets — a scalar-sized collect
    val touched = incoming.select(BucketCol).distinct().collect().map(_.getInt(0)).toSeq
    val affected = target.filter(col(BucketCol).isin(touched: _*))
    val merged = upsert(affected, incoming, keys)
    swapInPartitions(spark, tablePath, merged, BucketCol)
  }

  /** Stage `merged` (rows for the touched `partCol` values ONLY) and
    * swap each staged partition dir into the live table — the
    * partition-scoped rewrite shared by [[upsertBucketed]] and the IVF
    * index upsert. Displaced dirs go to a sibling per-invocation trash
    * dir (NOT `<dir>.old` inside the table, which partition discovery
    * would misread as a partition value; and NOT a fixed name, which a
    * crashed run's retry would delete before anything could be
    * recovered from it). Cleanup of a crashed invocation's trash is
    * best-effort/manual by design — the two-rename window is the same
    * recoverability contract as [[rewriteTable]]; true atomicity needs
    * a metastore commit.
    */
  private[graft] def swapInPartitions(spark: SparkSession, tablePath: String,
      merged: DataFrame, partCol: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)
    // per-invocation suffix (same contract as the trash dir): a fixed
    // staging name would let two concurrent invocations against the
    // same table overwrite each other's staging and swap in a mix
    val tmp = new Path(tablePath + ".tmppart-" +
      java.util.UUID.randomUUID().toString.take(8))
    merged.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(tmp.toString)
    val trash = new Path(tablePath + ".oldpart-" +
      java.util.UUID.randomUUID().toString.take(8))
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
