package graft

import org.apache.spark.sql.functions._
import graft.warehouse.Shards

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // (doc_id, lang, n_tok) — en stream: 60+60+100+90 tokens
    (1L, "en", 60L), (2L, "en", 60L), (3L, "en", 100L), (4L, "en", 90L),
    (5L, "de", 150L), (6L, "de", 10L))
    .toDF("doc_id", "lang", "n_tok")

  test("assign packs by running offset within each layout key") {
    val out = Shards.assign(corpus, col("n_tok"), Seq("lang"), budget = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // en offsets: 0, 60, 120, 220 → shards 0, 0, 1, 2
    assert(out(1L) === 0L && out(2L) === 0L && out(3L) === 1L && out(4L) === 2L)
    // de offsets: 0, 150 → shards 0, 1
    assert(out(5L) === 0L && out(6L) === 1L)
  }

  test("assign works on a corpus whose id column is not doc_id") {
    val generic = corpus.withColumnRenamed("doc_id", "uid")
    val out = Shards.assign(generic, col("n_tok"), Seq("lang"), budget = 100L,
      orderCol = col("uid"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) === 0L && out(3L) === 1L && out(6L) === 1L)
    // and a DIFFERENT ordering genuinely reorders the packing
    val rev = Shards.assign(generic, col("n_tok"), Seq("lang"), budget = 100L,
      orderCol = col("uid").desc)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // en stream desc: 90, 100, 60, 60 → offsets 0, 90, 190, 250 → shards 0, 0, 1, 2
    assert(rev(4L) === 0L && rev(3L) === 0L && rev(2L) === 1L && rev(1L) === 2L)
  }

  test("packing invariant: every shard holds < budget + its last doc") {
    val assigned = Shards.assign(corpus, col("n_tok"), Seq("lang"), budget = 100L)
    val perShard = assigned.groupBy("lang", "shard")
      .agg(sum("n_tok").as("tok"), max("n_tok").as("mx")).collect()
    // a shard only overflows by the doc that crossed the boundary
    perShard.foreach(r => assert(r.getAs[Long]("tok") < 100L + r.getAs[Long]("mx")))
  }

  test("packAndWrite lands one directory per (lang, shard) and round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/t"
    val stats = Shards.packAndWrite(corpus, col("n_tok"), Seq("lang"), 100L, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats("en") === ((3L, 4L)) && stats("de") === ((2L, 2L)))
    val back = spark.read.parquet(dir)
    assert(back.count() === 6)
    // the physical layout is the partition dirs a trainer prunes on
    val enShard0 = new java.io.File(s"$dir/lang=en/shard=0")
    assert(enShard0.isDirectory, s"missing ${enShard0}")
    // reading one shard dir touches only that shard's docs
    val one = spark.read.parquet(s"$dir/lang=en/shard=0")
    assert(one.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }
}
