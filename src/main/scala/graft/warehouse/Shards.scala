package graft.warehouse

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical shard layout for a curated corpus: the step after shard
  * ASSIGNMENT (the q73/q75 running-offset window) that actually lands
  * one directory per (partition keys..., shard) so a trainer reads a
  * shard as a unit — list one directory, stream its files, never touch
  * the rest of the corpus (plain partition pruning).
  */
object Shards {

  /** Assign token-budget shards within each combination of
    * `layoutKeys` (the q73 shape generalized): shard = floor(running
    * token offset / budget), window partitioned by the layout keys so
    * state is bounded per partition and no global sort exists.
    * `orderCol` is the running-offset order (a unique id column —
    * shard assignment is only deterministic if the ordering is total
    * within each layout-key combination).
    */
  def assign(docs: DataFrame, tokenCol: org.apache.spark.sql.Column,
      layoutKeys: Seq[String], budget: Long,
      orderCol: org.apache.spark.sql.Column = col("doc_id")): DataFrame = {
    val w = Window.partitionBy(layoutKeys.map(col): _*).orderBy(orderCol)
    docs.withColumn("shard",
      floor((sum(tokenCol).over(w) - tokenCol) / budget.toDouble).cast("long"))
  }

  /** Assign + write `partitionBy(layoutKeys :+ shard)`. Each shard dir
    * holds ~budget tokens of one (keys...) stream; readers prune to
    * exactly the shards they ask for. Returns the shard count per
    * layout key combination (small: one row per (keys, shard) group).
    */
  def packAndWrite(docs: DataFrame, tokenCol: org.apache.spark.sql.Column,
      layoutKeys: Seq[String], budget: Long, outDir: String,
      orderCol: org.apache.spark.sql.Column = col("doc_id")): DataFrame = {
    val assigned = assign(docs, tokenCol, layoutKeys, budget, orderCol)
    assigned.write.mode(SaveMode.Overwrite)
      .partitionBy(layoutKeys :+ "shard": _*).parquet(outDir)
    assigned.groupBy(layoutKeys.map(col): _*)
      .agg((max(col("shard")) + 1).as("n_shards"), count(lit(1)).as("n_docs"))
  }
}
