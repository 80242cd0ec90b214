package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.I: the reference has no
  * streaming — its closest analogue is hourly Airflow batch; this
  * module is the Spark-native upgrade of that pattern and the batch
  * queries in graft.queries.Events).
  *
  * All transforms take unbounded DataFrames/Datasets from `readStream`
  * and are spec-tested with MemoryStream; the same code also runs in
  * batch (Spark's unified API).
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  case class SessionState(startUs: Long, lastUs: Long, n: Long)

  /** Tumbling 1-hour windowed counts with a 2-hour watermark: late data
    * beyond the watermark is dropped, state is bounded — the streaming
    * form of `q48_event_hourly`.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("value_sum"))
      .select(col("w.start").as("hour"), col("event_type"), col("cnt"), col("value_sum"))

  /** Gap-based sessionization with explicit keyed state
    * (`flatMapGroupsWithState`): a session closes when an event arrives
    * more than `gapMinutes` after the previous one (emitting the closed
    * session) or when the state times out. Streaming form of
    * `q49_sessionize`.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      timeoutFlush: Boolean = false): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def micros(t: java.sql.Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000

    // timeoutFlush=true additionally closes idle sessions on a
    // processing-time timer — needed in production so the last session
    // of a quiet key eventually emits, but it keeps the micro-batch
    // loop ticking, so deterministic tests run with NoTimeout.
    val timeoutConf =
      if (timeoutFlush) GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeoutConf) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.startUs, s.lastUs, s.n))
          } else {
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.lastUs > gapUs =>
                  closed += SessionOut(userId, s.startUs, s.lastUs, s.n)
                  cur = Some(SessionState(t, t, 1))
                case Some(s) =>
                  cur = Some(SessionState(s.startUs, t, s.n + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach(state.update)
            if (timeoutFlush) state.setTimeoutDuration(s"$gapMinutes minutes")
            closed.iterator
          }
      }
  }

  /** Streaming ingest: watch a directory of parquet drops and merge
    * each micro-batch into the warehouse table with upsert semantics —
    * the streaming form of the reference's hourly idempotent re-load
    * (`airflow_dags.py:57-78` + ON CONFLICT).
    *
    * The target lives in `Merge.upsertBucketed`'s key-hash-partitioned
    * layout, so each micro-batch rewrites only the bucket dirs its keys
    * hash to — O(batch × table/nBuckets) per batch, not O(table). The
    * first batch migrates an unbucketed table once.
    */
  def ingestMerge(spark: SparkSession, srcDir: String, tablePath: String,
      keys: Seq[String], checkpoint: String,
      nBuckets: Int = 64): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.types.StructType
    // drop-in files carry the logical schema; the derived bucket column
    // exists only in the table's physical layout
    val schema = StructType(spark.read.parquet(tablePath).schema
      .filterNot(_.name == graft.warehouse.Merge.BucketCol))
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // a single micro-batch can carry the same key twice (several
        // file drops); upsert requires key-unique incoming, so collapse
        // first (arbitrary survivor among exact-key duplicates)
        graft.warehouse.Merge.upsertBucketed(
          spark, tablePath, batch.dropDuplicates(keys), keys, nBuckets)
      }
      .start()
  }
}
