package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-database read parity with the reference's `pd.read_sql`
  * surface (reference: dashboard.py:88, database.py:34 — every
  * reference query arrives through a DB connection + SQL string). The
  * engine owns its warehouse tables as parquet ([[graft.Tables]]), so
  * in-engine queries never touch JDBC; this passthrough exists for the
  * ingest/federation edge — pulling an OPERATIONAL system's table into
  * the warehouse.
  *
  * Scale stance: a plain JDBC read is ONE connection streaming the
  * whole table through the driver — correct only for small dimension
  * pulls. [[readPartitioned]] is the 100-TB-safe shape: `numPartitions`
  * executors each open a connection bounded by a predicate range on a
  * numeric/temporal column, so ingest parallelism and memory are both
  * capped per task. Catalyst pushes filters/projections into the
  * remote SQL for either path (`PushedFilters` in the scan node).
  */
object Jdbc {

  /** Single-connection read — dimension-table sized pulls only. */
  def read(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read: each of `numPartitions` tasks
    * scans `WHERE partitionCol BETWEEN …` stripes of [lower, upper].
    * Rows outside the bounds are still read (they land in the edge
    * stripes) — bounds tune parallelism, not filtering.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  /** Push an arbitrary SQL text to the remote engine (the literal
    * `pd.read_sql(query, conn)` shape): the query runs remotely and
    * only its result crosses the wire.
    */
  def readQuery(spark: SparkSession, url: String, sql: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, s"($sql) AS q", props)

  /** Write-back to an operational system (the reference's load step —
    * database.py's INSERT loops — as one batched parallel write).
    * Each partition opens one connection and streams batched INSERTs,
    * so write parallelism = partition count; `batchSize` bounds
    * per-round-trip rows. Repartition result-sized frames down first —
    * 200 partitions of 10 rows is 200 connections for nothing.
    */
  def write(df: DataFrame, url: String, table: String,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.Append,
      batchSize: Int = 1000,
      props: java.util.Properties = new java.util.Properties()): Unit = {
    val p = new java.util.Properties()
    p.putAll(props)
    p.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, p)
  }
}
