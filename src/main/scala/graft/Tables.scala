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
  /** The driver's `events.ts` is physically INT64 TIMESTAMP(NANOS)
    * parquet, which Spark refuses to read as a timestamp. Read nanos as
    * long, then truncate to microseconds — the same truncation DuckDB
    * applies when casting TIMESTAMP_NS → TIMESTAMP — so both engines
    * see identical microsecond-precision values.
    *
    * Dispatch on the ACTUAL read schema, not an assumption: a corpus
    * rewritten by another engine (e.g. `tools/make_stress.py`'s DuckDB
    * COPY) carries plain µs TIMESTAMP, where `ts` arrives as a proper
    * timestamp and needs no conversion — hard-coding the nanos path
    * broke every events query on such corpora.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(s.read.parquet(p(dir, "events")))
  }

  /** Normalize an events-shaped frame's `ts` to plain TIMESTAMP,
    * whatever the writer produced (also used by the streaming ingest,
    * which reads the same files through `readStream`).
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      // e.g. TIMESTAMP_NTZ (DuckDB COPY writes tz-less µs): everything
      // here is UTC, so reinterpreting in the pinned UTC session zone
      // is value-identical — and downstream unix_micros/window code
      // requires plain TIMESTAMP
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))
}
