package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join handles sort-merge cases adaptively at runtime; this
  * explicit salt is for the planner-level cases AQE can't split (e.g. a
  * shuffled join feeding a stateful op, or deterministic test plans):
  * the skewed (large) side gets a random salt in [0, factor), the
  * replicated (small) side is exploded across all salt values, and the
  * join key becomes (key, salt) — fanning one hot key across `factor`
  * reducers.
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `key`, salted `factor` ways.
    * `small` is replicated `factor`× — keep it the dimension side.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, factor: Int,
      seed: Long = 42L): DataFrame = {
    val salted = large.withColumn("__salt", (rand(seed) * factor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-`n` heaviest keys with counts — the diagnostic used to decide
    * whether salting (or a broadcast of the hot keys' rows) is needed.
    */
  def keyHistogram(df: DataFrame, key: String, n: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc)
      .limit(n)
}
