package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-bounded ANN path.
  *
  * IVF (cell pruning) and LSH (bucket pruning) cut how many vectors a
  * query READS; PQ cuts how many bytes each vector IS: a d=64 float
  * vector (256 B) compresses to m=16 one-byte codes, so a 100 TB
  * embedding column scans as ~1.6 TB of codes and the asymmetric
  * distance computation (ADC) scores a row with m table lookups
  * instead of d multiplies. The standard composition at extreme scale
  * is IVF(cells) × PQ(codes); here PQ stands alone so its recall is
  * measurable against brute force.
  *
  * Shapes: [[train]] is driver-side Lloyd's on a bounded sample (the
  * iForest-reservoir convention — codebooks are m·k·(d/m) doubles, a
  * constant); [[encode]] is pure per-row Column expressions (no UDF,
  * no shuffle); [[topK]] is ADC scoring + TakeOrderedAndProject over
  * the code table, then an exact re-rank of the refine·k survivors
  * against the raw vectors (broadcast id join), so reported
  * similarities are exact cosines and only recall is approximate.
  */
object Pq {

  /** m subspaces × k centroids × (dim/m) doubles, trained seeded. */
  final case class Codebook(m: Int, k: Int, dim: Int,
      centroids: Array[Array[Array[Double]]]) {
    def subDim: Int = dim / m
  }

  /** Seeded Lloyd's per subspace over a bounded driver-side sample.
    * `sampleN` caps the collect (constant-size, like the iForest
    * reservoir); ties and empty clusters resolve deterministically so
    * the same (corpus, seed) always yields the same codebook.
    */
  def train(embs: DataFrame, vecCol: String, m: Int = 16, k: Int = 16,
      sampleN: Int = 10000, seed: Long = 42L, iters: Int = 10): Codebook = {
    val sample = embs.select(Similarity.asDouble(col(vecCol)).as("v"))
      .limit(sampleN).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val rnd = new scala.util.Random(seed)
    val centroids = Array.tabulate(m) { j =>
      val subVecs = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      // init: k distinct-ish seeded picks
      var cents = Array.tabulate(k)(i => subVecs(rnd.nextInt(subVecs.length)).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Int](k)
        subVecs.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var i = 0
            while (i < sub) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c) // empty cluster keeps its centroid
          else { val s = sums(c); Array.tabulate(sub)(i => s(i) / counts(c)) }
        }
      }
      cents
    }
    Codebook(m, k, dim, centroids)
  }

  private def centLit(cb: Codebook, j: Int): Column =
    array(cb.centroids(j).map(c => array(c.map(lit): _*)): _*)

  /** Per-subspace nearest-centroid code, 0-based; first-match
    * tie-break (array_position) keeps encoding deterministic.
    */
  private def codeExpr(v: Column, cb: Codebook, j: Int): Column = {
    val sub = slice(v, j * cb.subDim + 1, cb.subDim)
    val dists = transform(centLit(cb, j), c =>
      aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** (id, codes array<int>[m], nrm) — the compressed index. The exact
    * norm rides along so ADC dot products serve cosine queries.
    */
  def encode(embs: DataFrame, idCol: String, vecCol: String, cb: Codebook): DataFrame = {
    val v = Similarity.asDouble(col(vecCol))
    embs.select(col(idCol),
      array((0 until cb.m).map(j => codeExpr(v, cb, j)): _*).as("codes"),
      Similarity.norm(v).as("nrm"))
  }

  /** ADC top-`n` candidate ids: score = Σ_j lut[j][code_j] / (|q|·|v|)
    * where lut[j][c] = q_subj · centroid_jc, computed driver-side
    * (m·k dots — constant). Per-row lookups + TakeOrderedAndProject;
    * the code table never shuffles.
    */
  def adcCandidates(encoded: DataFrame, cb: Codebook, idCol: String,
      qv: Array[Double], n: Int, excludeId: Option[Long] = None): DataFrame = {
    require(qv.length == cb.dim, s"query dim ${qv.length} != codebook dim ${cb.dim}")
    val lut = Array.tabulate(cb.m) { j =>
      Array.tabulate(cb.k) { c =>
        var d = 0.0; var i = 0
        while (i < cb.subDim) { d += qv(j * cb.subDim + i) * cb.centroids(j)(c)(i); i += 1 }
        d
      }
    }
    val lutLit = array(lut.map(row => array(row.map(lit): _*)): _*)
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val approxDot = (0 until cb.m)
      .map(j => element_at(element_at(lutLit, j + 1), element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val base = excludeId.fold(encoded)(q => encoded.filter(col(idCol) =!= q))
    base.select(col(idCol), (approxDot / (col("nrm") * qn)).as("approx_sim"))
      .orderBy(col("approx_sim").desc, col(idCol))
      .limit(n)
  }

  /** PQ top-k with exact re-rank: ADC keeps refine·k candidates, the
    * raw vectors of ONLY those ids (broadcast join) get exact cosines.
    * Output matches the brute-force schema; recall is the tunable.
    */
  def topK(embs: DataFrame, encoded: DataFrame, cb: Codebook, idCol: String,
      vecCol: String, qv: Array[Double], k: Int, refine: Int = 8,
      excludeId: Option[Long] = None): DataFrame = {
    val cand = adcCandidates(encoded, cb, idCol, qv, k * refine, excludeId)
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val qvLit = array(qv.map(lit): _*)
    val v = Similarity.asDouble(col(vecCol))
    embs.join(broadcast(cand.select(idCol)), idCol)
      .select(col(idCol),
        round(Similarity.dot(v, qvLit) / (Similarity.norm(v) * qn), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  // ---- IVF × PQ: the extreme-scale composition ----------------------------

  /** Persist the FAISS-shaped index: rows land cell-partitioned (IVF —
    * a probe is partition pruning, like `Similarity.writeIvfIndex`)
    * carrying PQ codes AND the raw vector (codes make the probed scan
    * m lookups/row; the vector makes the re-rank a second read of the
    * same pruned dirs, never a corpus-wide join). Sidecars: (cell,
    * centroid) for probe ranking, (j, c, center) for the codebook —
    * both constant-size.
    */
  def writeIvfPqIndex(embs: DataFrame, idCol: String, vecCol: String,
      nCells: Int, path: String, m: Int = 16, k: Int = 16, seed: Long = 42L): Unit = {
    val spark = embs.sparkSession
    import spark.implicits._
    val (indexed, cellCentroids) = Similarity.ivfIndex(embs, idCol, vecCol, nCells)
    val cb = train(embs, vecCol, m, k, seed = seed)
    val v = Similarity.asDouble(col(vecCol))
    indexed
      .select(col(idCol), col("cell"),
        array((0 until cb.m).map(j => codeExpr(v, cb, j)): _*).as("codes"),
        Similarity.norm(v).as("nrm"), col(vecCol))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cell").parquet(path + "/vectors")
    cellCentroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path + "/centroids")
    cb.centroids.zipWithIndex.flatMap { case (cents, j) =>
      cents.zipWithIndex.map { case (c, ci) => (j, ci, c.toSeq) }
    }.toSeq.toDF("j", "c", "center")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path + "/codebook")
  }

  /** Load the codebook sidecar back into driver memory (m·k·subDim
    * doubles — constant).
    */
  def readCodebook(spark: org.apache.spark.sql.SparkSession, path: String): Codebook = {
    val rows = spark.read.parquet(path + "/codebook").collect()
      .map(r => (r.getAs[Int]("j"), r.getAs[Int]("c"),
        r.getAs[scala.collection.Seq[Double]]("center").toArray))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val cents = Array.ofDim[Array[Double]](m, k)
    rows.foreach { case (j, c, arr) => cents(j)(c) = arr }
    Codebook(m, k, m * cents(0)(0).length, cents.map(_.toArray))
  }

  /** Serving top-k against a persisted IVF×PQ index: rank cells from
    * the centroid sidecar (driver-side, no job), ADC-scan ONLY the
    * nProbe winning cell dirs (PartitionFilters), exact re-rank of the
    * refine·k survivors against the raw vectors in those same pruned
    * dirs. Reported sims are exact cosines.
    */
  def ivfPqTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, qv: Array[Double], kTop: Int,
      nProbe: Int = 4, refine: Int = 8, excludeId: Option[Long] = None): DataFrame = {
    val cb = readCodebook(spark, path)
    val cells = spark.read.parquet(path + "/centroids").collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[scala.collection.Seq[Double]]("centroid"))
      .sortBy { case (_, c) =>
        c.iterator.zip(qv.iterator).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      .take(nProbe).map(_._1)
    val probed = spark.read.parquet(path + "/vectors")
      .filter(col("cell").isin(cells.toSeq: _*)) // → PartitionFilters
    val cand = adcCandidates(probed, cb, idCol, qv, kTop * refine, excludeId)
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val qvLit = array(qv.map(lit): _*)
    val v = Similarity.asDouble(col(vecCol))
    probed.join(broadcast(cand.select(idCol)), idCol)
      .select(col(idCol),
        round(Similarity.dot(v, qvLit) / (Similarity.norm(v) * qn), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(kTop)
  }
}
