package graft

import org.apache.spark.sql.functions._
import graft.warehouse.{Keys, Merge}

/** Merge/upsert (A7/C5) and surrogate keys (E2/§7.3). */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("id", "v", "x")

  test("upsert: incoming wins on key collision, new keys appended") {
    val incoming = Seq((2, "B", 99.0), (4, "d", 40.0)).toDF("id", "v", "x")
    val out = Merge.upsert(target, incoming, Seq("id")).orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    assert(out(1).getString(1) === "B" && out(1).getDouble(2) === 99.0)
  }

  test("upsert is idempotent") {
    val incoming = Seq((2, "B", 99.0), (4, "d", 40.0)).toDF("id", "v", "x")
    val once = Merge.upsert(target, incoming, Seq("id"))
    val twice = Merge.upsert(once, incoming, Seq("id"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("insertOnly never modifies existing rows") {
    val incoming = Seq((2, "B", 99.0), (4, "d", 40.0)).toDF("id", "v", "x")
    val out = Merge.insertOnly(target, incoming, Seq("id")).orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    assert(out(1).getString(1) === "b") // untouched
  }

  test("upsertBucketed re-buckets a pre-sidecar table whose layout contradicts the caller's N") {
    // table built with N=8, sidecar removed (pre-sidecar table), then a
    // caller claims N=4: the __bucket=7 dir proves 4 is wrong — the
    // merge must re-bucket with the caller's N instead of recording a
    // lie, and the result must hold exactly one row per key
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString + "/t"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val base = spark.range(64).select(col("id"), (col("id") * 2).as("v"))
    Merge.upsertBucketed(spark, dir, base, Seq("id"), nBuckets = 8)
    assert(Merge.readBucketsMeta(fs, dir) === Some(8))
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_graft_nbuckets"), false)
    val incoming = Seq((0L, -1L), (100L, 200L)).toDF("id", "v")
    Merge.upsertBucketed(spark, dir, incoming, Seq("id"), nBuckets = 4)
    assert(Merge.readBucketsMeta(fs, dir) === Some(4))
    val out = spark.read.parquet(dir)
    val maxBucket = out.agg(max(col("__bucket"))).head.getInt(0)
    assert(maxBucket < 4, s"layout still has bucket $maxBucket after re-bucketing to 4")
    assert(out.count() === 65)
    assert(out.filter(col("id") === 0L).select("v").head.getLong(0) === -1L)
    assert(out.groupBy("id").count().filter(col("count") > 1).count() === 0)
  }

  test("upsertBucketed detects an over-claimed N on a pre-sidecar table from data") {
    // table built with N=4, sidecar removed, then a caller claims N=8:
    // every dir name is < 8 so the layout alone can't refute the claim
    // — but hash(id) mod 8 disagrees with the dir for ~half the rows.
    // Recording 8 would route updated keys to different dirs than
    // their existing copies (silent duplicate keys); the merge must
    // detect the lie from sampled data and re-bucket with N=8.
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString + "/t"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val base = spark.range(64).select(col("id"), (col("id") * 2).as("v"))
    Merge.upsertBucketed(spark, dir, base, Seq("id"), nBuckets = 4)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_graft_nbuckets"), false)
    val incoming = Seq((0L, -1L), (100L, 200L)).toDF("id", "v")
    Merge.upsertBucketed(spark, dir, incoming, Seq("id"), nBuckets = 8)
    assert(Merge.readBucketsMeta(fs, dir) === Some(8))
    val out = spark.read.parquet(dir)
    assert(out.count() === 65)
    assert(out.filter(col("id") === 0L).count() === 1) // no duplicate key 0
    assert(out.filter(col("id") === 0L).select("v").head.getLong(0) === -1L)
    assert(out.groupBy("id").count().filter(col("count") > 1).count() === 0)
    // and the re-bucketed layout is the claimed one: recomputing
    // hash mod 8 over ALL rows matches every row's dir
    val relabeled = Merge.withBucket(
      out.withColumnRenamed("__bucket", "__dir"), Seq("id"), 8)
    assert(relabeled.filter(col("__bucket") =!= col("__dir")).count() === 0)
  }

  test("addSurrogate assigns contiguous keys in sort order, with offset") {
    val df = Seq("delta", "alpha", "charlie", "bravo").toDF("name")
    val keyed = Keys.addSurrogate(df, "k", Seq(col("name")), start = 100L)
      .orderBy("k").collect()
    assert(keyed.map(_.getLong(1)).toSeq === Seq(101L, 102L, 103L, 104L))
    assert(keyed.map(_.getString(0)).toSeq === Seq("alpha", "bravo", "charlie", "delta"))
  }

  test("addSurrogate matches the window variant on a larger input") {
    val df = spark.range(1000).select((col("id") * 37 % 1000).as("v"))
    val fast = Keys.addSurrogate(df, "k", Seq(col("v")))
    val slow = Keys.addSurrogateWindow(df, "k", Seq(col("v")))
    // same multiset of (v, k) pairs up to ties: compare sorted key sequences per v
    val a = fast.groupBy("v").agg(sort_array(collect_list("k")).as("ks"))
    val b = slow.groupBy("v").agg(sort_array(collect_list("k")).as("ks"))
    assert(a.join(b, Seq("v")).filter(a("ks") =!= b("ks")).count() === 0)
  }
}
