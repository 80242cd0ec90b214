package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * All queries read through here so that scan-level concerns (schema,
  * column pruning, future bucketing/caching) have one seam. Parquet +
  * column pruning + predicate pushdown means the physical scan only
  * materializes what each query projects/filters — verified via
  * `.explain("formatted")` (ReadSchema / PushedFilters) in the specs.
  */
object Tables {
  private def p(dir: String, name: String): String = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame     = s.read.parquet(p(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame     = s.read.parquet(p(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame       = s.read.parquet(p(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame     = s.read.parquet(p(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "lineitem"))
  /** `events.ts` is physically INT64 TIMESTAMP(NANOS) parquet, which
    * Spark refuses to read as a timestamp. Read nanos as long, then
    * truncate to microseconds — the same truncation DuckDB applies when
    * casting TIMESTAMP_NS → TIMESTAMP — so both engines see identical
    * microsecond-precision values.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.expr
    s.read.parquet(p(dir, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))
}
