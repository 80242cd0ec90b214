package graft.warehouse

import org.apache.spark.sql.{DataFrame, Row, Column}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Surrogate-key generation (SURVEY.md §2 E2, §7.3).
  *
  * The reference assigns contiguous keys with
  * `max_key + ROW_NUMBER() OVER (ORDER BY …)` (`dim_patients.sql:29-35`).
  * A global window is a single-partition bottleneck, so the default
  * here sorts once (range-partitioned sort, fully parallel) and then
  * zips a per-partition offset — same contiguous result, no
  * single-partition stage. The window variant is kept for reference
  * and for tiny dimensions where a one-partition sort is free.
  */
object Keys {

  /** Contiguous surrogate keys 'start+1 .. start+n' in `orderBy` order,
    * computed scalably: sort → count rows per partition → prefix-sum
    * offsets on the driver (one long per partition, not per row) →
    * per-partition zip.
    */
  def addSurrogate(df: DataFrame, keyName: String, orderBy: Seq[Column], start: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderBy: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(keyName, LongType, nullable = false))
    val withKeys = sorted.rdd.zipWithIndex // per-partition counts + offset zip, no global shuffle
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (start + i + 1)) }
    spark.createDataFrame(withKeys, schema)
  }

  /** Reference-shaped window variant — correct everywhere, bottlenecked
    * at one partition; use only for small dimensions.
    */
  def addSurrogateWindow(df: DataFrame, keyName: String, orderBy: Seq[Column], start: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{lit, row_number}
    df.withColumn(keyName, row_number().over(Window.orderBy(orderBy: _*)).cast("long") + lit(start))
  }
}
