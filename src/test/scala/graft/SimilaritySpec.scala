package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 1.0f), Array(1.0f, 0.0f), math.sqrt(0.5)))
      .toDF("a", "b", "expected")
      .select(Similarity.cosine(Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))).as("c"),
        col("expected"))
    assert(df.filter(abs(col("c") - col("expected")) > 1e-12).count() === 0)
  }

  test("brute-force top-k on sf0.001 returns k descending sims") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val top = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, 5).collect()
    assert(top.length === 5)
    val sims = top.map(_.getAs[Double]("cos_sim"))
    assert(sims.sliding(2).forall { case Array(x, y) => x >= y })
    assert(!top.map(_.getAs[Long]("vec_id")).contains(0L))
  }

  test("LSH ANN overlaps brute force and prunes the candidate set") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val n = embs.count()
    val bf = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val ann = Similarity.annTopK(embs, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(ann.nonEmpty && (bf & ann).nonEmpty) // prefilter keeps real neighbors
    val sk = Similarity.sketches(embs, "vec_id", "embedding")
    // each vector lands in exactly Tables buckets
    assert(sk.count() === n * Similarity.Tables)
  }

  test("blocked pair search only compares within blocks") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = Similarity.blockedPairs(embs, "vec_id", "embedding", "label", -1.0)
    val labels = embs.select(col("vec_id"), col("label"))
    val joined = pairs
      .join(labels.toDF("id_a", "la"), "id_a")
      .join(labels.toDF("id_b", "lb"), "id_b")
    assert(joined.filter(col("la") =!= col("lb")).count() === 0)
  }
}
